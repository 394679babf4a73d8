"""Runtime parameter system: a MOM_input-compatible config parser.

Re-implements the user-facing behavior of MOM6's MOM_file_parser
(reference: src/framework/MOM_file_parser.F90:66 and
docs/ _Runtime_parameter_system.dox) and MOM_document
(src/framework/MOM_document.F90):

* ``KEY = value`` assignments; ``!`` starts a comment; strings may be quoted
  with ``"`` or ``'``; logicals are ``True``/``False`` (case-insensitive);
  lists are comma separated;
* later files override earlier ones, and ``#override KEY = value`` lines take
  precedence over plain assignments anywhere;
* every ``get_param`` call is logged with its value, default, units and
  description so ``write_doc`` can emit ``MOM_parameter_doc.all`` /
  ``.short`` — config provenance is a product feature;
* parameters that are set but never read are reported by ``unused_params``.

This is plain host-side Python (runs once at init, never under jit).
"""

from __future__ import annotations

import io
import os
import re
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence

__all__ = ["ParamFile", "param_file_from_text"]

_ASSIGN_RE = re.compile(r"^\s*(#override\s+)?([A-Za-z_][A-Za-z0-9_%]*)\s*=\s*(.*)$")


def _strip_comment(line: str) -> str:
    """Remove trailing ! comments, respecting quoted strings."""
    out = []
    quote = None
    for ch in line:
        if quote:
            out.append(ch)
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
            out.append(ch)
        elif ch == "!":
            break
        else:
            out.append(ch)
    return "".join(out)


def _parse_scalar(tok: str, dtype: type):
    tok = tok.strip()
    if dtype is bool:
        t = tok.lower().rstrip(".").lstrip(".")
        if t in ("true", "t"):
            return True
        if t in ("false", "f"):
            return False
        raise ValueError(f"cannot parse logical from {tok!r}")
    if dtype is str:
        if len(tok) >= 2 and tok[0] in "\"'" and tok[-1] == tok[0]:
            return tok[1:-1]
        return tok
    if dtype is int:
        return int(float(tok))  # MOM_input allows 1E3-style ints
    if dtype is float:
        # Fortran double literals like 1.0d-4
        return float(tok.lower().replace("d", "e"))
    raise TypeError(f"unsupported param dtype {dtype}")


@dataclass
class _Entry:
    value: str           # raw RHS text
    override: bool
    source: str          # filename:line for error messages


@dataclass
class _LogRecord:
    name: str
    value: Any
    default: Any
    units: str
    desc: str
    module: str
    layout: bool = False
    debugging: bool = False


class ParamFile:
    """Typed access to a stack of MOM_input-style parameter files."""

    def __init__(self, paths: Sequence[str] = (), text: Optional[str] = None):
        self._entries: Dict[str, _Entry] = {}
        self._read: set = set()
        self._log: List[_LogRecord] = []
        self._log_seen: Dict[str, Any] = {}
        # directory of the primary parameter file: the default rundir
        # for resolving INPUTDIR-relative input files
        self.dir = os.path.dirname(os.path.abspath(paths[0])) if paths \
            else "."
        for p in paths:
            with open(p) as f:
                self._parse(f.read(), os.path.basename(p))
        if text is not None:
            self._parse(text, "<text>")

    # -- parsing --------------------------------------------------------------

    def _parse(self, text: str, fname: str) -> None:
        for lineno, raw in enumerate(text.splitlines(), start=1):
            line = _strip_comment(raw).strip()
            if not line:
                continue
            m = _ASSIGN_RE.match(line)
            if not m:
                # tolerate block syntax (KEY%...%KEY) and unknown directives
                if line.startswith("#") or line.endswith("%") or line.startswith("%"):
                    continue
                raise ValueError(f"{fname}:{lineno}: cannot parse line {raw!r}")
            override, key, rhs = bool(m.group(1)), m.group(2).upper(), m.group(3).strip()
            prev = self._entries.get(key)
            if prev is not None and prev.override and not override:
                continue  # existing #override wins over plain assignment
            if prev is not None and not prev.override and not override and prev.value != rhs:
                # last plain assignment wins (later file overrides earlier),
                # matching MOM6 multi-file semantics
                pass
            self._entries[key] = _Entry(rhs, override, f"{fname}:{lineno}")

    # -- typed reads ------------------------------------------------------------

    def get(self, name: str, dtype: type = float, default: Any = None, *,
            units: str = "", desc: str = "", module: str = "",
            layout: bool = False, debugging: bool = False) -> Any:
        """MOM6 ``get_param`` equivalent: typed read with default + logging."""
        key = name.upper()
        entry = self._entries.get(key)
        if entry is None:
            if default is None:
                raise KeyError(f"required parameter {name} not set and no default")
            value = default
        else:
            self._read.add(key)
            value = self._coerce(entry, dtype, key)
        self._record(key, value, default, units, desc, module, layout, debugging)
        return value

    def _coerce(self, entry: _Entry, dtype: type, key: str):
        try:
            if dtype in (list, tuple):
                return [_parse_scalar(t, float) for t in entry.value.split(",")]
            return _parse_scalar(entry.value, dtype)
        except (ValueError, TypeError) as e:
            raise ValueError(f"{entry.source}: bad value for {key}: {e}") from e

    def get_list(self, name: str, default: Sequence[float] = (), **kw) -> List[float]:
        key = name.upper()
        entry = self._entries.get(key)
        if entry is None:
            value = list(default)
        else:
            self._read.add(key)
            value = self._coerce(entry, list, key)
        self._record(key, value, list(default), kw.get("units", ""),
                     kw.get("desc", ""), kw.get("module", ""), False, False)
        return value

    def has(self, name: str) -> bool:
        return name.upper() in self._entries

    # -- documentation / audit ---------------------------------------------------

    def _record(self, key, value, default, units, desc, module, layout, debugging):
        if key in self._log_seen:
            if self._log_seen[key] != value:
                raise ValueError(
                    f"parameter {key} read twice with inconsistent values "
                    f"{self._log_seen[key]!r} vs {value!r}")
            return
        self._log_seen[key] = value
        self._log.append(_LogRecord(key, value, default, units, desc, module,
                                    layout, debugging))

    def unused_params(self) -> List[str]:
        return sorted(k for k in self._entries if k not in self._read)

    @staticmethod
    def _fmt(v: Any) -> str:
        if isinstance(v, bool):
            return "True" if v else "False"
        if isinstance(v, str):
            return f'"{v}"'
        if isinstance(v, (list, tuple)):
            return ", ".join(ParamFile._fmt(x) for x in v)
        return repr(v)

    def write_doc(self, directory: str, short: bool = True) -> None:
        """Emit MOM_parameter_doc.all (+ .short with non-default params only)."""
        os.makedirs(directory, exist_ok=True)
        variants = {"all": lambda r: True}
        if short:
            variants["short"] = lambda r: r.value != r.default
        for suffix, keep in variants.items():
            buf = io.StringIO()
            module = None
            for r in self._log:
                if not keep(r):
                    continue
                if r.module != module:
                    module = r.module
                    buf.write(f"\n! === module {module} ===\n")
                line = f"{r.name} = {self._fmt(r.value)}"
                if r.value == r.default:
                    line += f"   ! default = {self._fmt(r.default)}"
                elif r.default is not None:
                    line += f"   ! [modified from {self._fmt(r.default)}]"
                if r.units:
                    line += f"   ! [{r.units}]"
                buf.write(line + "\n")
                for dline in _wrap(r.desc):
                    buf.write(f"                ! {dline}\n")
            with open(os.path.join(directory, f"MOM_parameter_doc.{suffix}"), "w") as f:
                f.write(buf.getvalue())


def _wrap(text: str, width: int = 78) -> List[str]:
    words = text.split()
    lines: List[str] = []
    cur = ""
    for w in words:
        if len(cur) + len(w) + 1 > width:
            lines.append(cur)
            cur = w
        else:
            cur = f"{cur} {w}".strip()
    if cur:
        lines.append(cur)
    return lines


def param_file_from_text(text: str) -> ParamFile:
    return ParamFile(text=text)
