"""Hierarchical CPU timers and call-tree logging.

Analogue of MOM6's cpu_clock machinery (reference:
src/framework/MOM_cpu_clock.F90 wrapping FMS mpp clocks, the
id_clock_* begin/end pairs throughout src/core and the callTree_enter /
callTree_leave / callTree_waypoint logging of
src/framework/MOM_error_handler.F90:330-390).

Design: a process-global registry of named timers arranged in the call
hierarchy by nesting of ``with timer("name")`` contexts.  Each node
accumulates wall seconds and call counts; ``report()`` renders the
indented tree with percentages, the format of the FMS clock summary at
the end of a MOM6 run.  Under jit this measures host-side dispatch (the
useful number for the segment loop — device time comes from
jax.profiler); ``sync=True`` block_until_readys a pytree first so a
region's device work is attributed to it.

Call-tree logging (``calltree`` / ``set_calltree_verbosity``) prints
">", ">>", ... prefixed enter/leave/waypoint lines exactly when the
verbosity allows, the reference's debugging aid for locating where a
run died.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict, List, Optional

__all__ = ["timer", "report", "reset", "calltree",
           "set_calltree_verbosity", "callTree_enter", "callTree_leave",
           "callTree_waypoint"]


class _Node:
    __slots__ = ("name", "seconds", "calls", "children", "parent")

    def __init__(self, name: str, parent: Optional["_Node"]):
        self.name = name
        self.seconds = 0.0
        self.calls = 0
        self.children: Dict[str, "_Node"] = {}
        self.parent = parent


_root = _Node("run", None)
_current = _root
_depth = 0
_verbosity = 0


@contextmanager
def timer(name: str, sync=None):
    """Time a region; nested uses build the hierarchy.  ``sync``: an
    optional jax pytree to block_until_ready before stopping the clock,
    attributing its device time here."""
    global _current
    parent = _current
    node = parent.children.get(name)
    if node is None:
        node = parent.children[name] = _Node(name, parent)
    _current = node
    t0 = time.perf_counter()
    try:
        yield node
    finally:
        if sync is not None:
            import jax
            jax.block_until_ready(sync)
        node.seconds += time.perf_counter() - t0
        node.calls += 1
        _current = parent


def reset() -> None:
    global _root, _current
    _root = _Node("run", None)
    _current = _root


def report(min_frac: float = 0.0) -> str:
    """Indented timer tree with per-node seconds, calls and share of the
    parent (the end-of-run clock summary of FMS/MOM6)."""
    lines: List[str] = []
    total = sum(c.seconds for c in _root.children.values())

    def walk(node: _Node, depth: int, parent_s: float):
        for child in node.children.values():
            frac = child.seconds / parent_s if parent_s > 0 else 0.0
            if frac < min_frac:
                continue
            lines.append(f"{'  ' * depth}{child.name:<{40 - 2 * depth}s} "
                         f"{child.seconds:10.3f}s  {child.calls:8d} calls "
                         f"{100.0 * frac:6.1f}%")
            walk(child, depth + 1, child.seconds)

    lines.append(f"{'Total':<40s} {total:10.3f}s")
    walk(_root, 0, total)
    return "\n".join(lines)


def set_calltree_verbosity(v: int) -> None:
    """0 silent; >=1 enables callTree messages at depth <= v
    (MOM_error_handler's verbosity>=6 behavior)."""
    global _verbosity
    _verbosity = v


def calltree(msg: str) -> None:
    """A callTree_waypoint at the current depth."""
    if _verbosity > 0 and _depth < _verbosity:
        print(">" * (_depth + 1) + " " + msg)


def callTree_enter(msg: str) -> None:
    """Mark entry into a routine (callTree_enter,
    MOM_error_handler.F90:330)."""
    global _depth
    if _verbosity > 0 and _depth < _verbosity:
        print(">" * (_depth + 1) + " " + msg)
    _depth += 1


def callTree_leave(msg: str) -> None:
    global _depth
    _depth = max(0, _depth - 1)
    if _verbosity > 0 and _depth < _verbosity:
        print("<" * (_depth + 1) + " " + msg)


def callTree_waypoint(msg: str) -> None:
    calltree(msg)
