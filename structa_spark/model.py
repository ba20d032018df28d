"""The inferred-type IR: a lattice of summary nodes with a merge algebra.

Re-expresses the reference's type system (reference: structa/types.py:
234-1543) as plain dataclasses produced from Spark aggregation
results. Key semantics preserved:

* numeric tower ``Bool < Int < Float`` so merging an int column with a
  float column widens to float (types.py:780-834) — identical to Spark
  JSON inference widening LongType -> DoubleType;
* ``Repr`` wrappers capture *representation*: "str of int (base d)",
  "float of timestamp (unix epoch)" — i.e. the cast chain from
  physical to logical type;
* ``Empty`` is the identity of merge (types.py:1535-1543), like
  Spark's NullType in schema merge; ``ValueAny`` is the top
  (types.py:1457-1460);
* a Dict is either a *record* (known key set -> StructType) or a
  *table* (key type -> value type -> MapType), decided by
  ``field_threshold`` and the merge pass.

Every node can compile itself back into usable Spark artifacts — see
:mod:`structa_spark.plans`.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import List, Optional, Sequence, Tuple

from .chars import CharClass, pattern_str
from .stats import LengthStats, Stats

__all__ = [
    "Node", "Empty", "ValueAny", "BoolT", "IntT", "FloatT", "StrT",
    "URLT", "DateTimeT", "StrReprT", "NumReprT", "ListT", "TupleT",
    "FieldT", "RecordT", "TableT", "RenderOptions", "Styles",
    "ANSI_STYLES", "merge",
]


@dataclass(frozen=True)
class Styles:
    """ANSI fragments for styled rendering — the reference's XSLT
    style params (reference ui/cli.py:271-278: type=cyan,
    pattern=yellow, suffix/fill=green, unique=underline). Empty
    strings (the default) render plain text."""

    normal: str = ""
    type: str = ""
    pattern: str = ""
    suffix: str = ""
    unique: str = ""


ANSI_STYLES = Styles(normal="\x1b[0m", type="\x1b[36m",
                     pattern="\x1b[33m", suffix="\x1b[32m",
                     unique="\x1b[4m")


@dataclass(frozen=True)
class RenderOptions:
    """Display toggles (the reference CLI's --show-count/--show-lengths/
    --show-samples/--str-limit, reference ui/cli.py:120-158). Defaults
    reproduce the bare render.

    ``indent`` reproduces the reference display's multi-line layout
    (XSLT indent template, reference ui/cli.xsl:37-41): containers
    holding nested containers or more than one entry break onto
    indented lines, four spaces per level. ``styles`` colorizes the
    pieces the reference colors."""

    show_count: bool = False
    show_lengths: bool = False
    show_samples: bool = False
    show_graph: bool = False
    str_limit: Optional[int] = None
    indent: bool = False
    styles: Styles = field(default_factory=Styles)
    level: int = 0                  # internal: current nesting depth

    def s(self, kind: str, text: str) -> str:
        code = getattr(self.styles, kind)
        return f"{code}{text}{self.styles.normal}" if code else text

    def deeper(self) -> "RenderOptions":
        return replace(self, level=self.level + 1)

    def pad(self, extra: int = 0) -> str:
        return " " * (4 * (self.level + extra))


def _contains_container(n: "Node") -> bool:
    if isinstance(n, (RecordT, TableT, TupleT, ListT)):
        return True
    if isinstance(n, (StrReprT, NumReprT)):
        return _contains_container(n.inner)
    return False


_BARE = None  # set below once RenderOptions exists


@dataclass(frozen=True)
class Node:
    """Base of every summary node."""

    def render(self, opts: Optional[RenderOptions] = None) -> str:
        raise NotImplementedError

    @property
    def size(self) -> int:
        """Node count (merge-fixpoint metric, types.py:293-295)."""
        return 1


# ---------------------------------------------------------------------------
# leaves
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Empty(Node):
    """No type information (empty containers); merge identity."""

    def render(self, opts: Optional[RenderOptions] = None) -> str:
        return "empty"


@dataclass(frozen=True)
class ValueAny(Node):
    """Any type — irreducibly mixed values; merge top."""

    def render(self, opts: Optional[RenderOptions] = None) -> str:
        return "value"


def _sample_str(stats: Stats) -> str:
    """Reference sample display (types.py:142-163): with more than 6
    distinct sampled values, the 3 most frequent, an ellipsis, and the
    3 least frequent; otherwise everything."""
    top = list(stats.sample)
    bot = list(stats.bottom)
    n_vals = (stats.distinct if stats.distinct is not None
              else len(top) + len(bot))
    if n_vals > 6 and bot:
        head = ", ".join(str(v) for v, _ in top[:3])
        tail = ", ".join(str(v) for v, _ in bot[-3:])
        return f"{head} .. {tail}"
    seen, vals = set(), []
    for v, _ in top + bot:
        if v not in seen:
            seen.add(v)
            vals.append(str(v))
    return ", ".join(vals[:6])


def _decorate(out: str, stats: Stats, opts: "RenderOptions") -> str:
    if opts.show_graph:
        g = stats.quartile_graph()
        if g:
            out += f" graph={g}"
    if opts.show_samples and stats.sample:
        out += f" sample={_sample_str(stats)}"
    return out


@dataclass(frozen=True)
class Scalar(Node):
    stats: Stats = field(default_factory=Stats.empty)

    name = "scalar"

    def _styled_name(self, opts: RenderOptions) -> str:
        # reference styling: type names cyan, unique columns
        # underlined (ui/cli.py:271-278)
        out = opts.s("type", self.name)
        if self.stats.unique:
            out = opts.s("unique", out)
        return out

    def render(self, opts: Optional[RenderOptions] = None) -> str:
        opts = opts or RenderOptions()
        rng = self.stats.range_str(opts.str_limit)
        if rng:
            # the reference styles the whole range suffix with
            # suffix-style (green), reference ui/cli.xsl:44-49
            rng = opts.s("suffix", rng)
        out = f"{self._styled_name(opts)} {rng}".strip()
        return _decorate(out, self.stats, opts)


@dataclass(frozen=True)
class BoolT(Scalar):
    name = "bool"


@dataclass(frozen=True)
class IntT(Scalar):
    name = "int"


@dataclass(frozen=True)
class FloatT(Scalar):
    name = "float"


@dataclass(frozen=True)
class DateTimeT(Scalar):
    name = "datetime"


@dataclass(frozen=True)
class StrT(Scalar):
    name = "str"
    lengths: LengthStats = field(default_factory=LengthStats)
    pattern: Optional[Tuple[CharClass, ...]] = None

    def render(self, opts: Optional[RenderOptions] = None) -> str:
        opts = opts or RenderOptions()
        rng = self.stats.range_str(opts.str_limit)
        if rng:
            rng = opts.s("suffix", rng)
        pat = (' pattern=' + opts.s("pattern",
                                    f'"{pattern_str(self.pattern)}"')
               if self.pattern else "")
        out = f"{self._styled_name(opts)} {rng}".strip() + pat
        if opts.show_lengths and self.lengths.min is not None:
            out += (f" len={self.lengths.min}" if self.lengths.fixed
                    else f" len={self.lengths.min}..{self.lengths.max}")
        return _decorate(out, self.stats, opts)


@dataclass(frozen=True)
class URLT(StrT):
    name = "URL"

    def render(self, opts: Optional[RenderOptions] = None) -> str:
        opts = opts or RenderOptions()
        return opts.s("type", "URL")


@dataclass(frozen=True)
class StrReprT(Node):
    """A string *representation* of an inner type, e.g. str of int.

    ``pattern`` is the conversion spec: int base char (o/d/x), 'f' for
    float, a bool word-pair like 'false|true', or a strptime-style
    datetime format (reference: types.py:1113-1194).
    """

    inner: Node = field(default_factory=ValueAny)
    pattern: str = ""

    def render(self, opts: Optional[RenderOptions] = None) -> str:
        opts = opts or RenderOptions()
        quoted = f'"{self.pattern}"'
        return (f'{opts.s("type", "str")} of {self.inner.render(opts)}'
                f' pattern={opts.s("pattern", quoted)}')

    @property
    def size(self) -> int:
        return 1 + self.inner.size


@dataclass(frozen=True)
class NumReprT(Node):
    """A numeric representation of an inner type, e.g. float of
    timestamp (epoch seconds): value = (num - offset_days) * scale
    relative to an epoch (reference: types.py:1197-1254)."""

    inner: Node = field(default_factory=ValueAny)
    pattern: str = "f"           # 'd' int-encoded, 'f' float-encoded
    epoch: str = "unix"          # unix | excel | custom
    scale: float = 86400.0       # seconds per unit
    # seconds from the Unix epoch to this repr's base (0 for unix,
    # -2209161600 for excel, arbitrary for --timestamps custom bases);
    # carried so the compiled cast chain decodes against the RIGHT base
    epoch_offset: float = 0.0

    def render(self, opts: Optional[RenderOptions] = None) -> str:
        opts = opts or RenderOptions()
        phys = "float" if self.pattern == "f" else "int"
        return f'{opts.s("type", phys)} of {self.inner.render(opts)}'

    @property
    def size(self) -> int:
        return 1 + self.inner.size


# ---------------------------------------------------------------------------
# containers
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ListT(Node):
    """Homogeneous sequence -> ArrayType(element)."""

    element: Node = field(default_factory=Empty)
    lengths: LengthStats = field(default_factory=LengthStats)

    def render(self, opts: Optional[RenderOptions] = None) -> str:
        opts = opts or RenderOptions()
        if opts.indent and _contains_container(self.element):
            deep = opts.deeper()
            body = ("[\n" + opts.pad(1) + self.element.render(deep)
                    + "\n" + opts.pad() + "]")
        else:
            body = f"[ {self.element.render(opts)} ]"
        if opts.show_lengths and self.lengths.min is not None:
            body += (f" len={self.lengths.min}" if self.lengths.fixed
                     else f" len={self.lengths.min}..{self.lengths.max}")
        return body

    @property
    def size(self) -> int:
        return 1 + self.element.size


@dataclass(frozen=True)
class FieldT(Node):
    """One literal record key (reference: types.py:1320-1434)."""

    key: object = None
    value: Node = field(default_factory=Empty)
    count: int = 0
    optional: bool = False

    def render(self, opts: Optional[RenderOptions] = None) -> str:
        opts = opts or RenderOptions()
        opt = opts.s("suffix", "?") if self.optional else ""
        cnt = f" x{self.count}" if opts.show_count else ""
        return f"'{self.key}'{opt}{cnt}: {self.value.render(opts)}"

    @property
    def size(self) -> int:
        return 1 + self.value.size


@dataclass(frozen=True)
class RecordT(Node):
    """A Dict with a known small key set -> StructType."""

    fields: Tuple[FieldT, ...] = ()
    lengths: LengthStats = field(default_factory=LengthStats)

    def render(self, opts: Optional[RenderOptions] = None) -> str:
        opts = opts or RenderOptions()
        if opts.indent and (len(self.fields) > 1 or any(
                _contains_container(f.value) for f in self.fields)):
            deep = opts.deeper()
            inner = ",\n".join(
                opts.pad(1) + f.render(deep) for f in self.fields)
            return "{\n" + inner + "\n" + opts.pad() + "}"
        inner = ", ".join(f.render(opts) for f in self.fields)
        return "{ " + inner + " }"

    @property
    def size(self) -> int:
        return 1 + sum(f.size for f in self.fields)


@dataclass(frozen=True)
class TableT(Node):
    """A Dict used as a keyed table: key type -> value type -> MapType."""

    key: Node = field(default_factory=ValueAny)
    value: Node = field(default_factory=ValueAny)
    lengths: LengthStats = field(default_factory=LengthStats)

    def render(self, opts: Optional[RenderOptions] = None) -> str:
        opts = opts or RenderOptions()
        if opts.indent and (_contains_container(self.key)
                            or _contains_container(self.value)):
            deep = opts.deeper()
            entry = self.key.render(deep) + ": " + self.value.render(deep)
            return "{\n" + opts.pad(1) + entry + "\n" + opts.pad() + "}"
        return ("{ " + self.key.render(opts) + ": "
                + self.value.render(opts) + " }")

    @property
    def size(self) -> int:
        return 1 + self.key.size + self.value.size


@dataclass(frozen=True)
class TupleT(Node):
    """Heterogeneous fixed-arity sequence (CSV rows) -> positional
    StructType (reference: types.py:534-630)."""

    fields: Tuple[FieldT, ...] = ()
    lengths: LengthStats = field(default_factory=LengthStats)

    def render(self, opts: Optional[RenderOptions] = None) -> str:
        opts = opts or RenderOptions()
        if opts.indent and (len(self.fields) > 1 or any(
                _contains_container(f.value) for f in self.fields)):
            deep = opts.deeper()
            inner = ",\n".join(
                opts.pad(1) + f.value.render(deep) for f in self.fields)
            return "(\n" + inner + "\n" + opts.pad() + ")"
        inner = ", ".join(f.value.render(opts) for f in self.fields)
        return "( " + inner + " )"

    @property
    def size(self) -> int:
        return 1 + sum(f.size for f in self.fields)


# ---------------------------------------------------------------------------
# merge algebra (summary union — the reference's `+`)
# ---------------------------------------------------------------------------

_NUMERIC_RANK = {BoolT: 0, IntT: 1, FloatT: 2}


def _merge_stats(a: Stats, b: Stats) -> Stats:
    return a + b


def merge(a: Node, b: Node) -> Node:
    """Merge two compatible summaries; widen along the lattice.

    Returns :class:`ValueAny` when the two are incompatible (type
    mixing is never threshold-excused — reference docs tutorial F4).
    """
    # identity / top
    if isinstance(a, Empty):
        return b
    if isinstance(b, Empty):
        return a
    if isinstance(a, ValueAny) or isinstance(b, ValueAny):
        return ValueAny()

    # numeric tower: widen to the higher rank
    ra, rb = _NUMERIC_RANK.get(type(a)), _NUMERIC_RANK.get(type(b))
    if ra is not None and rb is not None:
        cls = type(a) if ra >= rb else type(b)
        return cls(stats=_merge_stats(a.stats, b.stats))

    if isinstance(a, DateTimeT) and isinstance(b, DateTimeT):
        return DateTimeT(stats=_merge_stats(a.stats, b.stats))

    # URL < Str
    if isinstance(a, StrT) and isinstance(b, StrT):
        if isinstance(a, URLT) and isinstance(b, URLT):
            cls = URLT
        else:
            cls = StrT
        pattern = None
        if a.pattern and b.pattern and len(a.pattern) == len(b.pattern):
            pattern = tuple(x | y for x, y in zip(a.pattern, b.pattern))
        lengths = LengthStats(
            card=a.lengths.card + b.lengths.card,
            min=_optmin(a.lengths.min, b.lengths.min),
            max=_optmax(a.lengths.max, b.lengths.max),
        )
        return cls(stats=_merge_stats(a.stats, b.stats),
                   lengths=lengths, pattern=pattern)

    if isinstance(a, StrReprT) and isinstance(b, StrReprT):
        if a.pattern == b.pattern or _compatible_reprs(a.pattern, b.pattern):
            inner = merge(a.inner, b.inner)
            if not isinstance(inner, ValueAny):
                pat = a.pattern if len(a.pattern) >= len(b.pattern) else b.pattern
                return StrReprT(inner=inner, pattern=pat)
        # str-of-X vs plain str falls through to ValueAny
    if isinstance(a, StrReprT) and isinstance(b, StrT):
        return StrT(stats=_merge_stats(_inner_stats(a), b.stats),
                    lengths=b.lengths)
    if isinstance(a, StrT) and isinstance(b, StrReprT):
        return merge(b, a)

    if isinstance(a, NumReprT) and isinstance(b, NumReprT):
        if ((a.epoch, a.scale, a.epoch_offset)
                == (b.epoch, b.scale, b.epoch_offset)):
            inner = merge(a.inner, b.inner)
            if not isinstance(inner, ValueAny):
                pat = "f" if "f" in (a.pattern, b.pattern) else a.pattern
                return NumReprT(inner=inner, pattern=pat,
                                epoch=a.epoch, scale=a.scale,
                                epoch_offset=a.epoch_offset)
    if isinstance(a, NumReprT) and type(b) in _NUMERIC_RANK:
        return merge(_denote(a), b)
    if type(a) in _NUMERIC_RANK and isinstance(b, NumReprT):
        return merge(a, _denote(b))

    if isinstance(a, ListT) and isinstance(b, ListT):
        return ListT(element=merge(a.element, b.element),
                     lengths=_merge_lengths(a.lengths, b.lengths))

    if isinstance(a, TupleT) and isinstance(b, TupleT):
        return TupleT(fields=_zip_fields(a.fields, b.fields),
                      lengths=_merge_lengths(a.lengths, b.lengths))

    if isinstance(a, RecordT) and isinstance(b, RecordT):
        return RecordT(fields=_zip_record_fields(a.fields, b.fields),
                       lengths=_merge_lengths(a.lengths, b.lengths))

    if isinstance(a, TableT) and isinstance(b, TableT):
        return TableT(key=merge(a.key, b.key),
                      value=merge(a.value, b.value),
                      lengths=_merge_lengths(a.lengths, b.lengths))

    # record x table: fields absorb into the key domain
    if isinstance(a, RecordT) and isinstance(b, TableT):
        val = b.value
        for f in a.fields:
            val = merge(val, f.value)
        return TableT(key=b.key, value=val,
                      lengths=_merge_lengths(a.lengths, b.lengths))
    if isinstance(a, TableT) and isinstance(b, RecordT):
        return merge(b, a)

    return ValueAny()


def _compatible_reprs(p1: str, p2: str) -> bool:
    # int bases merge with each other and with float 'f'
    bases = {"o", "d", "x", "f"}
    return p1 in bases and p2 in bases


def _inner_stats(n: Node) -> Stats:
    if isinstance(n, (StrReprT, NumReprT)):
        return _inner_stats(n.inner)
    if isinstance(n, Scalar):
        return n.stats
    return Stats.empty()


def _denote(n: NumReprT) -> Node:
    """Forget the timestamp interpretation, keep the physical type."""
    cls = FloatT if n.pattern == "f" else IntT
    return cls(stats=_inner_stats(n))


def _optmin(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return min(a, b)


def _optmax(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return max(a, b)


def _merge_lengths(a: LengthStats, b: LengthStats) -> LengthStats:
    return LengthStats(card=a.card + b.card,
                       min=_optmin(a.min, b.min),
                       max=_optmax(a.max, b.max))


def _zip_fields(fa: Sequence[FieldT], fb: Sequence[FieldT]) -> Tuple[FieldT, ...]:
    """Positional alignment; missing positions become optional
    (reference: types.py:1580-1589)."""
    out = []
    for i in range(max(len(fa), len(fb))):
        a = fa[i] if i < len(fa) else None
        b = fb[i] if i < len(fb) else None
        if a is None or b is None:
            f = a or b
            out.append(replace(f, optional=True))
        else:
            out.append(FieldT(key=a.key, value=merge(a.value, b.value),
                              count=a.count + b.count,
                              optional=a.optional or b.optional))
    return tuple(out)


def _zip_record_fields(fa: Sequence[FieldT], fb: Sequence[FieldT]) -> Tuple[FieldT, ...]:
    """Name alignment; fields present on one side only become optional
    (reference: types.py:1592-1624, unionByName semantics)."""
    by_key = {f.key: f for f in fa}
    out: List[FieldT] = []
    seen = set()
    for f in fa:
        g = next((x for x in fb if x.key == f.key), None)
        seen.add(f.key)
        if g is None:
            out.append(replace(f, optional=True))
        else:
            out.append(FieldT(key=f.key, value=merge(f.value, g.value),
                              count=f.count + g.count,
                              optional=f.optional or g.optional))
    for g in fb:
        if g.key not in seen:
            out.append(replace(g, optional=True))
    return tuple(out)


def record_similarity(a: RecordT, b: RecordT) -> float:
    """Fraction of shared keys relative to the smaller record
    (merge-threshold gate, reference: types.py:1598-1606)."""
    ka = {f.key for f in a.fields}
    kb = {f.key for f in b.fields}
    if not ka or not kb:
        return 0.0
    return len(ka & kb) / min(len(ka), len(kb))


def walk_nodes(n: Node):
    """Depth-first iterator over every node of a summary tree."""
    yield n
    if isinstance(n, (StrReprT, NumReprT)):
        yield from walk_nodes(n.inner)
    elif isinstance(n, ListT):
        yield from walk_nodes(n.element)
    elif isinstance(n, TableT):
        yield from walk_nodes(n.key)
        yield from walk_nodes(n.value)
    elif isinstance(n, (RecordT, TupleT)):
        for f in n.fields:
            yield from walk_nodes(f.value)


def node_to_dict(n: Node) -> dict:
    """JSON-able representation of a summary tree (used by
    ``Profile.to_dict`` and the CLI's ``--json`` output)."""
    def stats_d(s):
        if s is None:
            return None
        return {k: (str(v) if not isinstance(
                    v, (int, float, bool, type(None))) else v)
                for k, v in (("card", s.card), ("distinct", s.distinct),
                             ("min", s.min), ("q1", s.q1), ("q2", s.q2),
                             ("q3", s.q3), ("max", s.max),
                             ("unique", s.unique))}

    out = {"type": type(n).__name__.removesuffix("T").lower()}
    if isinstance(n, Scalar):
        out["stats"] = stats_d(n.stats)
    if isinstance(n, StrT):
        out["lengths"] = {"min": n.lengths.min, "max": n.lengths.max}
        if n.pattern:
            from .chars import pattern_str
            out["pattern"] = pattern_str(n.pattern)
    if isinstance(n, (StrReprT, NumReprT)):
        out["pattern"] = n.pattern
        out["of"] = node_to_dict(n.inner)
    if isinstance(n, NumReprT):
        out["epoch"] = n.epoch
        out["scale"] = n.scale
    if isinstance(n, ListT):
        out["lengths"] = {"min": n.lengths.min, "max": n.lengths.max}
        out["element"] = node_to_dict(n.element)
    if isinstance(n, TableT):
        out["key"] = node_to_dict(n.key)
        out["value"] = node_to_dict(n.value)
    if isinstance(n, (RecordT, TupleT)):
        out["fields"] = [
            {"key": f.key, "count": f.count, "optional": f.optional,
             "value": node_to_dict(f.value)}
            for f in n.fields
        ]
    return out
