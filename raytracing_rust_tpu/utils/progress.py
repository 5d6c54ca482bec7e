"""Terminal progress bar wired to real render progress.

The reference ships a progress bar (src/progressbar.rs) that is pure
simulation (sleeps per step) and dead code (every call site commented out,
e.g. tests/test.rs:527-528). This one is live: `render(..., progress=bar)`
calls it per completed (block, sample-chunk).
"""

from __future__ import annotations

import shutil
import sys
import time


class ProgressBar:
    def __init__(self, desc: str = "render", stream=None):
        self.desc = desc
        self.stream = stream or sys.stderr
        self.start = time.monotonic()

    def __call__(self, done: int, total: int) -> None:
        width = shutil.get_terminal_size((80, 20)).columns
        bar_w = max(10, width - len(self.desc) - 30)
        frac = done / max(total, 1)
        filled = int(bar_w * frac)
        elapsed = time.monotonic() - self.start
        eta = elapsed / frac - elapsed if frac > 0 else 0.0
        self.stream.write(
            f"\r{self.desc} |{'█' * filled}{' ' * (bar_w - filled)}| "
            f"{100 * frac:5.1f}% eta {eta:6.1f}s")
        if done >= total:
            self.stream.write("\n")
        self.stream.flush()
