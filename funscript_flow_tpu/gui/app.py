"""Desktop GUI (tkinter) — the reference's Generation tab, Qt-free.

The reference ships a PySide6 two-tab window (App, FunscriptFlow.pyw
:1721-2603). Qt is not available on a TPU host image, and tkinter ships
with CPython, so the GUI is rebuilt on tkinter with the same surface:

* file/folder pickers feeding a batch list (recursive folder scan with the
  extension whitelist, reference :2064-2070)
* VR / POV checkboxes, keyframe-reduction + overwrite checkboxes
* backend dropdown annotated with availability (reference :2008-2013)
* advanced settings: threads, detrend window, norm window, batch size —
  defaults follow the CLI (the reference GUI had *different* defaults,
  SURVEY.md §2.1 #22; we use one set)
* Run/Cancel, overall + per-video progress bars, live log pane
* completion dialog offering View Log / Open in Preview (browser preview,
  gui.preview) — reference :2426-2444
* working config save/load buttons (the reference's save was unreachable
  from its UI, :2266-2281)

Drag-and-drop is not supported (needs a tk extension); use the pickers.
"""

from __future__ import annotations

import os
import threading
import webbrowser

from ..io.decode import find_videos
from ..utils.backends import get_available_backends, get_device_info
from ..utils.config import load_config, save_config
from ..utils.params import Params
from ..utils.strings import STRINGS
from ..worker import BatchWorker

__all__ = ["collect_settings", "launch"]


def collect_settings(widgets: dict) -> Params:
    """Map GUI widget values -> Params (testable without a display)."""
    return Params(
        threads=int(widgets["threads"]),
        detrend_window=float(widgets["detrend_window"]),
        norm_window=float(widgets["norm_window"]),
        batch_size=int(widgets["batch_size"]),
        overwrite=bool(widgets["overwrite"]),
        vr_mode=bool(widgets["vr_mode"]),
        pov_mode=bool(widgets["pov_mode"]),
        keyframe_reduction=bool(widgets["keyframe_reduction"]),
        backend=str(widgets["backend"]).split(" ")[0],
        cut_threshold=float(widgets.get("cut_threshold", 7.0)),
    )


def launch() -> int:
    try:
        import tkinter as tk
        from tkinter import filedialog, messagebox, ttk
    except Exception as e:  # no tkinter in this environment
        print(f"GUI unavailable ({e}); use the CLI: "
              f"python -m funscript_flow_tpu.cli <video-or-folder>")
        return 2

    backends = get_available_backends()

    root = tk.Tk()
    root.title(STRINGS["app_title"])
    root.geometry("760x640")

    files: list = []
    worker_box = {"w": None}

    # --- file list -----------------------------------------------------------
    frm_files = ttk.LabelFrame(root, text="Videos")
    frm_files.pack(fill="both", expand=False, padx=8, pady=4)
    listbox = tk.Listbox(frm_files, height=6)
    listbox.pack(fill="x", padx=4, pady=4)

    def add_files():
        for p in filedialog.askopenfilenames(title="Select videos"):
            files.append(p)
            listbox.insert("end", p)

    def add_folder():
        d = filedialog.askdirectory(title="Select folder")
        if d:
            for p in find_videos(d):
                files.append(p)
                listbox.insert("end", p)

    def clear_files():
        files.clear()
        listbox.delete(0, "end")

    bar = ttk.Frame(frm_files)
    bar.pack(fill="x", padx=4, pady=2)
    ttk.Button(bar, text="Add files", command=add_files).pack(side="left")
    ttk.Button(bar, text="Add folder", command=add_folder).pack(side="left", padx=4)
    ttk.Button(bar, text="Clear", command=clear_files).pack(side="left")

    # --- options -------------------------------------------------------------
    frm_opt = ttk.LabelFrame(root, text="Options")
    frm_opt.pack(fill="x", padx=8, pady=4)
    v_vr = tk.BooleanVar(value=False)
    v_pov = tk.BooleanVar(value=False)
    v_kr = tk.BooleanVar(value=True)
    v_ow = tk.BooleanVar(value=False)
    ttk.Checkbutton(frm_opt, text="VR mode", variable=v_vr).grid(row=0, column=0, sticky="w")
    ttk.Checkbutton(frm_opt, text="POV mode", variable=v_pov).grid(row=0, column=1, sticky="w")
    ttk.Checkbutton(frm_opt, text="Keyframe reduction", variable=v_kr).grid(row=0, column=2, sticky="w")
    ttk.Checkbutton(frm_opt, text="Overwrite existing", variable=v_ow).grid(row=0, column=3, sticky="w")
    ttk.Label(frm_opt, text="Backend:").grid(row=1, column=0, sticky="e")
    v_backend = tk.StringVar(value="TPU")
    choices = [f"TPU {'(available)' if backends['TPU'] else '(no device!)'}",
               "DIS (available)"]
    ttk.Combobox(frm_opt, textvariable=v_backend, values=choices,
                 state="readonly", width=24).grid(row=1, column=1, columnspan=2, sticky="w")

    # --- advanced ------------------------------------------------------------
    frm_adv = ttk.LabelFrame(root, text="Advanced settings")
    frm_adv.pack(fill="x", padx=8, pady=4)
    entries = {}
    for i, (label, key, default) in enumerate([
        ("Threads", "threads", 8),
        ("Detrend window (s)", "detrend_window", 2.0),
        ("Norm window (s)", "norm_window", 3.0),
        ("Batch size", "batch_size", 3000),
        ("Cut threshold", "cut_threshold", 7.0),
    ]):
        ttk.Label(frm_adv, text=label).grid(row=i // 3, column=(i % 3) * 2, sticky="e")
        var = tk.StringVar(value=str(default))
        entries[key] = var
        ttk.Entry(frm_adv, textvariable=var, width=8).grid(
            row=i // 3, column=(i % 3) * 2 + 1, sticky="w", padx=4)

    def current_settings() -> Params:
        return collect_settings({
            "threads": entries["threads"].get(),
            "detrend_window": entries["detrend_window"].get(),
            "norm_window": entries["norm_window"].get(),
            "batch_size": entries["batch_size"].get(),
            "cut_threshold": entries["cut_threshold"].get(),
            "overwrite": v_ow.get(),
            "vr_mode": v_vr.get(),
            "pov_mode": v_pov.get(),
            "keyframe_reduction": v_kr.get(),
            "backend": v_backend.get(),
        })

    def apply_settings(p: Params):
        entries["threads"].set(str(p.threads))
        entries["detrend_window"].set(str(p.detrend_window))
        entries["norm_window"].set(str(p.norm_window))
        entries["batch_size"].set(str(p.batch_size))
        entries["cut_threshold"].set(str(p.cut_threshold))
        v_ow.set(p.overwrite)
        v_vr.set(p.vr_mode)
        v_pov.set(p.pov_mode)
        v_kr.set(p.keyframe_reduction)
        v_backend.set(p.backend)

    cfgbar = ttk.Frame(frm_adv)
    cfgbar.grid(row=2, column=0, columnspan=6, sticky="w", pady=2)
    ttk.Button(cfgbar, text="Save config",
               command=lambda: save_config(current_settings())).pack(side="left")
    ttk.Button(cfgbar, text="Load config",
               command=lambda: apply_settings(load_config())).pack(side="left", padx=4)
    ttk.Button(cfgbar, text="Device info",
               command=lambda: messagebox.showinfo("Devices", get_device_info())
               ).pack(side="left")

    # --- progress + log ------------------------------------------------------
    frm_run = ttk.Frame(root)
    frm_run.pack(fill="x", padx=8, pady=4)
    pb_all = ttk.Progressbar(frm_run, maximum=100)
    pb_all.pack(fill="x", pady=2)
    pb_vid = ttk.Progressbar(frm_run, maximum=100)
    pb_vid.pack(fill="x", pady=2)

    log_text = tk.Text(root, height=12, state="disabled")
    log_text.pack(fill="both", expand=True, padx=8, pady=4)

    def log_line(msg):
        def _append():
            log_text.configure(state="normal")
            log_text.insert("end", msg + "\n")
            log_text.see("end")
            log_text.configure(state="disabled")
        root.after(0, _append)

    def on_finished(error, generated):
        def _done():
            btn_run.configure(state="normal")
            btn_cancel.configure(state="disabled")
            w = worker_box["w"]
            msg = "Batch processing complete."
            if error:
                msg += " Errors occurred — see the log."
            if generated and messagebox.askyesno(
                    "Done", msg + "\nOpen the last result in the browser preview?"):
                from .preview import write_preview

                page = write_preview(generated[-1][0])
                webbrowser.open(f"file://{os.path.abspath(page)}")
            elif w is not None and w.log_path:
                messagebox.showinfo("Done", f"{msg}\nLog: {w.log_path}")
        root.after(0, _done)

    def run_batch():
        if not files:
            messagebox.showwarning("No videos", "Add video files or a folder first.")
            return
        btn_run.configure(state="disabled")
        btn_cancel.configure(state="normal")
        w = BatchWorker(
            files, current_settings(),
            on_progress=lambda p: root.after(0, pb_all.configure, {"value": p}),
            on_video_progress=lambda p: root.after(0, pb_vid.configure, {"value": p}),
            on_log=log_line,
            on_finished=on_finished,
        )
        worker_box["w"] = w
        w.start()

    def cancel_batch():
        w = worker_box["w"]
        if w is not None:
            w.cancel()

    btns = ttk.Frame(root)
    btns.pack(pady=4)
    btn_run = ttk.Button(btns, text="Run", command=run_batch)
    btn_run.pack(side="left", padx=4)
    btn_cancel = ttk.Button(btns, text="Cancel", command=cancel_batch, state="disabled")
    btn_cancel.pack(side="left", padx=4)

    apply_settings(load_config())
    root.mainloop()
    return 0
