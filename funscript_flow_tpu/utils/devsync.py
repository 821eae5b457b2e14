"""Process-wide serialization of device (relay) interactions.

The TPU on this deployment shape is reached through a relay/proxy backend,
and its client wedges when several Python threads issue blocking device
calls concurrently: with two folder workers in ``jax.device_get`` and two
prewarm threads in a first-execute (executable load) at the same time, all
four block forever with zero CPU advance — identical stacks across repeated
faulthandler dumps minutes apart (reproduced deterministically on the
2-worker folder warm run, NOTES_ROUND5). Single-threaded device use never
wedges, so the fix is to make the process look single-threaded to the
relay: every dispatch, upload, materialization, and prewarm execute takes
``DEVICE_LOCK``.

Host-side work — C++ decode, window assembly, the exact signal chain,
funscript emit — never takes the lock, so the decode/compute overlap that
folder parallelism exists for is untouched; what serializes is only the
device round trips themselves, which were serialized server-side anyway.

The lock is re-entrant so a guarded caller may call another guarded helper
(e.g. ``_upload_and_run`` -> ``_start_fetch``) without deadlocking itself.
"""

import threading

DEVICE_LOCK = threading.RLock()
