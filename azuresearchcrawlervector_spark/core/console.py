"""Leveled console sink (S11) — the reference's 5-level IConsole with a
verbose gate, re-expressed for a Spark driver process.

Semantics reproduced (Interfaces/IConsole.cs:5-20, Models/LogLevel.cs:3-10,
Adapters/SystemConsoleAdapter.cs:22-45, DEVELOPMENT.md:25-81):
- levels VERBOSE < DEBUG < INFORMATION < WARNING < ERROR
- ERROR → stderr; everything else → stdout
- VERBOSE/DEBUG print only when the verbose gate is on, prefixed
  "VERBOSE: " / "DEBUG: " exactly like SystemConsoleAdapter
- ``CapturingConsole`` is the TestConsole analog (TestUtilities/
  TestConsole.cs): records (level, message) for assertions.

Driver-side only by design: executors report through the metrics table
(per-partition lineage rows), not stdout — on a 1000-executor cluster
stdout is not an aggregatable sink.
"""

from __future__ import annotations

import sys
from enum import IntEnum


class LogLevel(IntEnum):
    VERBOSE = 0
    DEBUG = 1
    INFORMATION = 2
    WARNING = 3
    ERROR = 4


class Console:
    """stdout/stderr adapter with the reference's verbose gate."""

    def __init__(self, verbose: bool = False,
                 out=None, err=None):
        self._verbose = verbose
        self._out = out
        self._err = err

    # streams resolved lazily so pytest capsys / redirects are honored
    @property
    def out(self):
        return self._out or sys.stdout

    @property
    def err(self):
        return self._err or sys.stderr

    def set_verbose(self, verbose: bool) -> None:
        self._verbose = verbose

    def write_line(self, message: str,
                   level: LogLevel = LogLevel.INFORMATION) -> None:
        if level == LogLevel.ERROR:
            print(message, file=self.err)
        elif level == LogLevel.VERBOSE:
            if self._verbose:
                print(f"VERBOSE: {message}", file=self.out)
        elif level == LogLevel.DEBUG:
            if self._verbose:
                print(f"DEBUG: {message}", file=self.out)
        else:
            print(message, file=self.out)

    # the reference's convenience surface
    def write_info_line(self, message: str) -> None:
        self.write_line(message, LogLevel.INFORMATION)

    def write_debug_line(self, message: str) -> None:
        self.write_line(message, LogLevel.DEBUG)

    def write_verbose_line(self, message: str) -> None:
        self.write_line(message, LogLevel.VERBOSE)

    def write_warning_line(self, message: str) -> None:
        self.write_line(message, LogLevel.WARNING)

    def write_error(self, message: str) -> None:
        self.write_line(message, LogLevel.ERROR)


class CapturingConsole(Console):
    """TestConsole analog: keeps every (level, message), still applies
    the verbose gate to what lands in ``lines`` (what a user would see)
    while ``all_messages`` records everything."""

    def __init__(self, verbose: bool = False):
        super().__init__(verbose)
        self.lines: list[tuple[LogLevel, str]] = []
        self.all_messages: list[tuple[LogLevel, str]] = []

    def write_line(self, message: str,
                   level: LogLevel = LogLevel.INFORMATION) -> None:
        self.all_messages.append((level, message))
        if level in (LogLevel.VERBOSE, LogLevel.DEBUG) and not self._verbose:
            return
        self.lines.append((level, message))
