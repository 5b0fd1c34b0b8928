"""Structured scalar logging (SURVEY.md §7 "Metrics / logging" row).

Replaces the reference's bare prints: jsonl records per eval, with
host-0-only emission under multi-host so logs aren't duplicated N ways.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Optional

import jax


class JsonlLogger:
    """Appends one JSON object per record; also mirrors to stdout."""

    def __init__(self, path: Optional[str] = None, mirror_stdout: bool = True):
        self.path = path
        self.mirror = mirror_stdout
        self._is_host0 = jax.process_index() == 0

    def __call__(self, record: dict) -> None:
        if not self._is_host0:
            return
        rec = {"t": time.time(), **record}
        line = json.dumps(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")
        if self.mirror:
            print(line, file=sys.stderr)
