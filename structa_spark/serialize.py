"""Full-fidelity JSON (de)serialization of profiles.

``model.node_to_dict`` is the *display* form (lossy, human-oriented);
this module round-trips the complete summary tree — stats, samples,
patterns, reprs — so a profile can be persisted next to the data it
describes and reloaded to drive schema compilation, validation, or
merging (``merge_profiles``) without re-scanning anything.
"""

from __future__ import annotations

import datetime as _dt
import json
from dataclasses import fields as dc_fields
from typing import Any

from .chars import ANY_CHAR, CharClass
from .model import (
    BoolT, DateTimeT, Empty, FieldT, FloatT, IntT, ListT, Node, NumReprT,
    RecordT, StrReprT, StrT, TableT, TupleT, URLT, ValueAny,
)
from .stats import LengthStats, Stats

_NODE_TYPES = {
    cls.__name__: cls
    for cls in (BoolT, DateTimeT, Empty, FieldT, FloatT, IntT, ListT,
                NumReprT, RecordT, StrReprT, StrT, TableT, TupleT, URLT,
                ValueAny)
}


def _enc(v: Any) -> Any:
    if isinstance(v, _dt.datetime):
        return {"$dt": v.isoformat()}
    if isinstance(v, (bytes, bytearray)):
        import base64
        return {"$b64": base64.b64encode(bytes(v)).decode("ascii")}
    if isinstance(v, CharClass):
        return {"$cc": None if v is ANY_CHAR or isinstance(v, type(ANY_CHAR))
                else sorted(v.chars)}
    if isinstance(v, Node):
        out = {"$node": type(v).__name__}
        for f in dc_fields(v):
            out[f.name] = _enc(getattr(v, f.name))
        return out
    if isinstance(v, Stats):
        return {"$stats": {f.name: _enc(getattr(v, f.name))
                           for f in dc_fields(v)}}
    if isinstance(v, LengthStats):
        return {"$lengths": {f.name: getattr(v, f.name)
                             for f in dc_fields(v)}}
    if isinstance(v, (tuple, list)):
        return [_enc(x) for x in v]
    return v


def _dec(v: Any) -> Any:
    if isinstance(v, list):
        return tuple(_dec(x) for x in v)
    if not isinstance(v, dict):
        return v
    if "$dt" in v:
        return _dt.datetime.fromisoformat(v["$dt"])
    if "$b64" in v:
        import base64
        return base64.b64decode(v["$b64"])
    if "$cc" in v:
        return ANY_CHAR if v["$cc"] is None else CharClass(v["$cc"])
    if "$stats" in v:
        return Stats(**{k: _dec(x) for k, x in v["$stats"].items()})
    if "$lengths" in v:
        return LengthStats(**v["$lengths"])
    if "$node" in v:
        cls = _NODE_TYPES[v["$node"]]
        kwargs = {k: _dec(x) for k, x in v.items() if k != "$node"}
        return cls(**kwargs)
    return v


def profile_to_json(profile) -> str:
    return json.dumps({
        "row_count": profile.row_count,
        "root": _enc(profile.root),
    })


def profile_from_json(s: str):
    from .analyzer import AnalyzerConfig, Profile
    d = json.loads(s)
    return Profile(root=_dec(d["root"]), row_count=d["row_count"],
                   cfg=AnalyzerConfig())


def save_profile(profile, path: str) -> None:
    with open(path, "w") as fh:
        fh.write(profile_to_json(profile))


def load_profile(path: str):
    with open(path) as fh:
        return profile_from_json(fh.read())
