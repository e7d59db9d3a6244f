"""Registry package: ONE logical module in five ordered source parts.

The single-file registry outgrew 10k lines (round-3 verdict item 6).
This split keeps exactly the original semantics: every part executes,
in order, inside THIS module's globals, so cross-part references, the
shared ORACLES dict, test monkey-patching
(``mock.patch.object(registry, ...)``), and Spark's pickling of
query functions by module reference all behave as in the single-file
layout. Parts are plain Python files split at top-level statement
boundaries in the original session order; tracebacks point at the
real part file and line.
"""

import pathlib as _pathlib

_here = _pathlib.Path(__file__).parent
for _part in ("part1.py", "part2.py", "part3.py", "part4.py", "part5.py"):
    _p = _here / _part
    exec(compile(_p.read_text(), str(_p), "exec"), globals())  # noqa: S102
del _part, _p, _here, _pathlib
