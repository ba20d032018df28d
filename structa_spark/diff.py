"""Profile diffing: schema-drift detection between two summaries.

The operational loop this serves: profile yesterday's partition, save
it (:mod:`structa_spark.serialize`), profile today's, and diff — new
fields, dropped fields, type changes and domain shifts surface
without re-reading yesterday's data. All driver-side over the
KB-sized IR; no Spark jobs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple, Union

from .analyzer import Profile
from .model import (
    ListT, Node, NumReprT, RecordT, StrReprT, TableT, TupleT,
)


@dataclass(frozen=True)
class Change:
    path: Tuple[str, ...]
    kind: str            # added | removed | type_changed |
    #                      optionality_changed | range_changed |
    #                      pattern_changed | uniqueness_changed
    before: Optional[str] = None
    after: Optional[str] = None

    def render(self) -> str:
        loc = ".".join(self.path) or "<root>"
        if self.kind == "added":
            return f"+ {loc}: {self.after}"
        if self.kind == "removed":
            return f"- {loc}: {self.before}"
        return f"~ {loc}: {self.kind} {self.before} -> {self.after}"


def _type_name(n: Node) -> str:
    if isinstance(n, (StrReprT, NumReprT)):
        return f"{type(n).__name__}[{_type_name(n.inner)}]"
    return type(n).__name__


def _range_str(n: Node) -> Optional[str]:
    stats = getattr(n, "stats", None)
    if stats is None or stats.min is None:
        return None
    return f"{stats.min}..{stats.max}"


def diff_nodes(old: Node, new: Node,
               path: Tuple[str, ...] = ()) -> List[Change]:
    out: List[Change] = []
    if type(old) is not type(new):
        out.append(Change(path, "type_changed",
                          _type_name(old), _type_name(new)))
        return out
    if isinstance(old, (RecordT, TupleT)):
        old_f = {f.key: f for f in old.fields}
        new_f = {f.key: f for f in new.fields}
        for k in old_f:
            if k not in new_f:
                out.append(Change(path + (str(k),), "removed",
                                  before=old_f[k].value.render()))
        for k in new_f:
            if k not in old_f:
                out.append(Change(path + (str(k),), "added",
                                  after=new_f[k].value.render()))
        for k in old_f.keys() & new_f.keys():
            fo, fn = old_f[k], new_f[k]
            if fo.optional != fn.optional:
                out.append(Change(
                    path + (str(k),), "optionality_changed",
                    "optional" if fo.optional else "required",
                    "optional" if fn.optional else "required"))
            out.extend(diff_nodes(fo.value, fn.value, path + (str(k),)))
        return out
    if isinstance(old, TableT):
        out.extend(diff_nodes(old.key, new.key, path + ("{k}",)))
        out.extend(diff_nodes(old.value, new.value, path + ("{v}",)))
        return out
    if isinstance(old, ListT):
        return diff_nodes(old.element, new.element, path + ("[]",))
    if isinstance(old, (StrReprT, NumReprT)):
        if old.pattern != new.pattern:
            out.append(Change(path, "type_changed",
                              f"pattern={old.pattern!r}",
                              f"pattern={new.pattern!r}"))
        if isinstance(old, NumReprT) and (
                old.epoch != new.epoch or old.scale != new.scale
                or old.epoch_offset != new.epoch_offset):
            # same numeric pattern, different decode rule — values
            # land ~70 years apart between unix and excel epochs
            out.append(Change(
                path, "type_changed",
                f"epoch={old.epoch} scale={old.scale}",
                f"epoch={new.epoch} scale={new.scale}"))
        out.extend(diff_nodes(old.inner, new.inner, path))
        return out
    # scalar leaves: char-class pattern, uniqueness and domain drift
    op = getattr(old, "pattern", None)
    np_ = getattr(new, "pattern", None)
    if op != np_:
        from .chars import pattern_str
        out.append(Change(
            path, "pattern_changed",
            pattern_str(op) if op else None,
            pattern_str(np_) if np_ else None))
    so = getattr(old, "stats", None)
    sn = getattr(new, "stats", None)
    if so is not None and sn is not None and so.unique != sn.unique:
        out.append(Change(path, "uniqueness_changed",
                          "unique" if so.unique else "non-unique",
                          "unique" if sn.unique else "non-unique"))
    ro, rn = _range_str(old), _range_str(new)
    if ro != rn and ro is not None and rn is not None:
        out.append(Change(path, "range_changed", ro, rn))
    return out


def diff_profiles(old: Union[Profile, Node],
                  new: Union[Profile, Node]) -> List[Change]:
    """Structural + domain drift between two profiles (or raw summary
    nodes). Ordered by path; empty list = no drift."""
    o = old.root if isinstance(old, Profile) else old
    n = new.root if isinstance(new, Profile) else new
    return sorted(diff_nodes(o, n), key=lambda c: (c.path, c.kind))


def render_diff(changes: List[Change]) -> str:
    return "\n".join(c.render() for c in changes) or "(no drift)"
