"""UI/log string table with strings.json override (reference :345-388).

Hardcoded defaults, overridden by a ``strings.json`` next to the working
directory if present and readable — the reference's lightweight i18n hook.
"""

from __future__ import annotations

import json
import os

__all__ = ["STRINGS", "load_strings"]

_DEFAULTS = {
    "app_title": "Funscript Flow (TPU)",
    "found_files": "Found {n} file(s).",
    "processing_file": "Processing file {current}/{total}: {video_path}",
    "funscript_saved": "Funscript saved to: {output_path}",
    "log_error": "ERROR: {error}",
    "batch_processing_complete": "Batch processing complete.",
    "skipping_exists": "Skipping: output file exists ({output_path})",
    "user_cancelled": "User bailed.",
    "video_too_short": "ERROR: Video too short to analyze ({n} sampled frames).",
    "processing_video": "Processing video: {video_path}",
    "processing_time": "Processing time: {seconds:.2f} seconds",
}


def load_strings(path: str = "strings.json") -> dict:
    strings = dict(_DEFAULTS)
    if os.path.exists(path):
        try:
            with open(path) as f:
                strings.update(json.load(f))
        except Exception:
            pass  # unreadable override -> defaults (reference behavior)
    return strings


STRINGS = load_strings()
