"""Environment-variable perf knobs.

Every opt-in/opt-out kernel or layout toggle in the framework reads the
same ``BPX_*`` boolean convention through :func:`env_flag`, so the
default and the comparison cannot drift between sites (historically each
knob inlined its own ``os.environ.get(...) != "0"`` with slight
variations).  Convention: unset -> the knob's default; ``"0"`` -> off;
anything else -> on.
"""

from __future__ import annotations

import os


def env_flag(name: str, default: bool) -> bool:
    """Boolean ``BPX_*`` knob: unset -> ``default``, "0" -> False,
    any other value -> True."""
    val = os.environ.get(name)
    if val is None:
        return default
    return val != "0"
