"""Config hot-reload watcher + notifier (ref ST4;
/root/reference/app/helpers/watchers.py FileModificationWatcher polls config
mtimes, app/helpers/notifier.py emails each new outlier).

``FileModificationWatcher`` is a faithful polling watcher (no inotify
dependency). ``Notifier`` keeps the reference's dedup-by-summary behavior;
the SMTP transport is a pluggable callable — the default ``collect``
transport records messages (this sandbox has no mail server), a production
deployment passes an smtplib sender.
"""

from __future__ import annotations

import os
from collections.abc import Callable


class FileModificationWatcher:
    """Tracks mtimes of a set of files; ``changed()`` returns the paths whose
    mtime moved since the last check (ref watchers.py:1-33)."""

    def __init__(self, paths: list[str]):
        self.paths = list(paths)
        self._mtimes = {p: self._mtime(p) for p in self.paths}

    @staticmethod
    def _mtime(p: str) -> float | None:
        try:
            return os.stat(p).st_mtime
        except OSError:
            return None

    def changed(self) -> list[str]:
        out = []
        for p in self.paths:
            m = self._mtime(p)
            if m != self._mtimes[p]:
                self._mtimes[p] = m
                out.append(p)
        return out


class Notifier:
    """Sends one notification per NEW outlier summary (the reference dedups
    notifications on the outlier's summary text — notifier.py keeps a seen
    set). Transport = callable(subject, body); default collects for tests."""

    def __init__(self, transport: Callable[[str, str], None] | None = None,
                 max_seen: int = 100_000):
        self.sent: list[tuple[str, str]] = []
        self._transport = transport or (
            lambda subject, body: self.sent.append((subject, body))
        )
        self._seen: set[str] = set()
        self._max_seen = max_seen

    def notify_outlier(self, summary: str, detail: str = "") -> bool:
        if summary in self._seen:
            return False
        if len(self._seen) >= self._max_seen:
            self._seen.clear()  # bounded memory, like a rolling dedup cache
        self._seen.add(summary)
        self._transport(f"ee-outliers: {summary}", detail)
        return True
