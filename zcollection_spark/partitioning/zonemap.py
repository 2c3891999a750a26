"""Zone-map (min/max) predicate evaluation for partition skipping.

Data skipping for predicates on NON-partition-key columns: each
partition's catalog entry can carry ``{col: [min, max, null_count]}``
statistics collected at publish time (``Collection`` with
``stats_columns``).  ``compile_zone_filter`` turns a ``where``
expression (the partition-filter grammar of ``expression.py``, plus
float literals) into a conservative *may-match* test over those
statistics:

- ``True``  → the partition MIGHT hold matching rows (must be scanned);
- ``False`` → the partition PROVABLY holds none (skipped before Spark
  ever lists its files — at 100 TB this is the difference between a
  pruned scan and a full pass for selective non-key predicates, the
  same contract as Delta/Iceberg file-level skipping).

Soundness over precision: every uncertainty (missing statistics,
unknown column, mixed types, negation of an interval fact) degrades to
"scan it".  The exact predicate is always ALSO applied to the scanned
rows as a Catalyst filter, so pruning is an optimization, never the
correctness boundary.

The evaluator computes a (may, must) pair per node so ``not`` stays
sound: ``may(not X) = not must(X)`` — interval facts rarely prove a
*must*, which only ever costs precision.

No reference counterpart: the reference prunes on partition keys only
(``/root/reference/zcollection/partitioning/expression.py``); this
module extends the same grammar to data-column statistics.
"""

from __future__ import annotations

import ast
import math
from typing import Any, Callable, Mapping, Sequence

from ..errors import ExpressionError

#: interval marker: every value of the column in this partition is NULL.
#: SQL comparisons with NULL are never true, so nothing can match.
_EMPTY = object()
#: interval marker: nothing is known about this operand.
_TOP = object()


class _Interval:
    """Closed interval [lo, hi] with a null flag; _EMPTY / _TOP states."""

    __slots__ = ("lo", "hi", "state", "has_null")

    def __init__(self, lo=None, hi=None, state=None, has_null=False):
        self.lo, self.hi, self.state, self.has_null = lo, hi, state, has_null

    @classmethod
    def point(cls, v) -> "_Interval":
        return cls(v, v)

    @classmethod
    def top(cls) -> "_Interval":
        return cls(state=_TOP)

    @classmethod
    def empty(cls) -> "_Interval":
        return cls(state=_EMPTY)


def _cmp_bounds(op: type, a: "_Interval", b: "_Interval") -> tuple[bool, bool]:
    """(may, must) for ``a OP b`` over intervals.  Any TypeError from an
    incomparable stat/literal type pair degrades to (True, False)."""
    if a.state is _EMPTY or b.state is _EMPTY:
        return False, False  # all-null operand: no row can satisfy OP
    if a.state is _TOP or b.state is _TOP:
        return True, False
    # a null anywhere blocks 'must' (that row fails the predicate)
    nullable = a.has_null or b.has_null
    try:
        if op is ast.Lt:
            may, must = a.lo < b.hi, a.hi < b.lo
        elif op is ast.LtE:
            may, must = a.lo <= b.hi, a.hi <= b.lo
        elif op is ast.Gt:
            may, must = a.hi > b.lo, a.lo > b.hi
        elif op is ast.GtE:
            may, must = a.hi >= b.lo, a.lo >= b.hi
        elif op is ast.Eq:
            may = a.lo <= b.hi and b.lo <= a.hi
            must = a.lo == a.hi == b.lo == b.hi
        elif op is ast.NotEq:
            may = not (a.lo == a.hi == b.lo == b.hi)
            must = a.hi < b.lo or b.hi < a.lo
        else:  # pragma: no cover - parser rejects other operators
            return True, False
    except TypeError:
        return True, False
    return may, must and not nullable


def _contains(a: "_Interval", container: tuple) -> tuple[bool, bool]:
    """(may, must) for ``a in container``."""
    if a.state is _EMPTY:
        return False, False
    if a.state is _TOP:
        return True, False
    try:
        may = any(a.lo <= v <= a.hi for v in container)
        must = (a.lo == a.hi and a.lo in container
                and not a.has_null)
    except TypeError:
        return True, False
    return may, must


# -- bloom probes (equality skipping on high-cardinality columns) -----------

#: hash count of the partition bloom filters (md5 gives 32 hex chars =
#: four independent 32-bit slices; three are used)
BLOOM_K = 3


def bloom_value_positions(value, m_bits: int) -> list:
    """The k bit positions of ``value`` in an ``m_bits`` bloom filter.

    Canonicalization is the CAST-TO-STRING form shared with the
    Spark-side build (``collection/stats.py``): ``str(int)`` matches
    Spark's long→string cast exactly, strings hash as themselves —
    which is why blooms are restricted to integer/string columns."""
    import hashlib
    digest = hashlib.md5(str(value).encode("utf-8")).hexdigest()
    return [int(digest[8 * j:8 * j + 8], 16) % m_bits
            for j in range(BLOOM_K)]


def bloom_may_contain(entry, value) -> bool:
    """Conservative membership probe against a stats bloom entry
    (``{"m", "k", "t", "b64"}``).  Returns False ONLY when the probe is
    sound: the literal's Python type matches the column kind recorded
    at build time (``t``: "i" int / "s" str — cross-type comparisons
    go through Spark casts whose string canon differs, e.g. ``5.0`` vs
    ``"5"``, so they always scan), and all k bits miss.  Any anomaly —
    malformed entry, unknown kind, wrong m — degrades to True (scan)."""
    import base64
    import struct
    try:
        if not isinstance(entry, dict):
            return True
        kind = entry.get("t")
        if isinstance(value, bool):
            return True
        if not ((kind == "i" and isinstance(value, int))
                or (kind == "s" and isinstance(value, str))):
            return True
        m = int(entry["m"])
        raw = base64.b64decode(entry["b64"])
        if len(raw) * 8 != m or int(entry.get("k")) != BLOOM_K:
            return True
        longs = struct.unpack(f"<{len(raw) // 8}q", raw)
        return all((longs[pos >> 6] >> (pos & 63)) & 1
                   for pos in bloom_value_positions(value, m))
    except Exception:
        return True


def _bloom_may(stats, name: str, value) -> bool:
    entry = (stats or {}).get(f"{name}#bloom")
    if entry is None:
        return True
    return bloom_may_contain(entry, value)


# -- the walker (mirrors expression.py's grammar) ---------------------------


def _literal(node: ast.expr) -> Any:
    """Like ``expression._literal`` but admitting float scalars — data
    columns are often floating point; partition-key filters keep the
    reference's int/str-only rule (quirk pinned in test_lowlevel)."""
    if isinstance(node, ast.Constant) \
            and isinstance(node.value, (int, float, str)) \
            and not isinstance(node.value, bool):
        return node.value
    if isinstance(node, (ast.Tuple, ast.List, ast.Set)):
        return tuple(_literal(elt) for elt in node.elts)
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub) \
            and isinstance(node.operand, ast.Constant) \
            and isinstance(node.operand.value, (int, float)):
        return -node.operand.value
    raise ExpressionError(
        f"unsupported literal at line {node.lineno}: only int/float/str "
        f"scalars and tuple/list/set containers are allowed")


def _interval_of(name: str, stats: Mapping[str, Sequence] | None) -> _Interval:
    if not stats or name not in stats:
        return _Interval.top()
    entry = stats[name]
    lo, hi = entry[0], entry[1]
    nulls = int(entry[2]) if len(entry) > 2 and entry[2] is not None else 0
    if lo is None or hi is None:
        return _Interval.empty() if nulls else _Interval.top()
    # Defensive: a NaN bound (older catalogs written before stats.py
    # collected NaN-free bounds — json round-trips NaN) makes every
    # Python comparison False, which would silently prune partitions
    # that hold matching rows.  Degrade to TOP, never prune on it.
    if any(isinstance(b, float) and math.isnan(b) for b in (lo, hi)):
        return _Interval.top()
    return _Interval(lo, hi, has_null=nulls > 0)


def _operand(node: ast.expr):
    """stats → _Interval."""
    if isinstance(node, ast.Name):
        return lambda stats, _n=node.id: _interval_of(_n, stats)
    value = _literal(node)
    if isinstance(value, tuple):
        raise ExpressionError("container literal only allowed after 'in'")
    return lambda stats, _v=value: _Interval.point(_v)


def _compare(node: ast.Compare):
    operands = [node.left, *node.comparators]
    parts = []
    for left, op, right in zip(operands, node.ops, operands[1:]):
        lf = _operand(left)
        if isinstance(op, (ast.In, ast.NotIn)):
            container = _literal(right)
            if not isinstance(container, tuple):
                raise ExpressionError(
                    "right side of 'in' must be a tuple/list/set literal")
            negate = isinstance(op, ast.NotIn)
            # positive membership can ALSO consult the column's bloom:
            # every candidate missing the filter proves no row matches
            # (NotIn cannot prune via bloom — may-contain is one-sided)
            bname = left.id if isinstance(left, ast.Name) \
                and not negate else None

            def part(stats, _lf=lf, _c=container, _n=negate, _b=bname):
                may, must = _contains(_lf(stats), _c)
                if _n:
                    return (not must), (not may)
                if may and _b is not None \
                        and not any(_bloom_may(stats, _b, v) for v in _c):
                    may = False
                return may, must
            parts.append(part)
            continue
        op_type = type(op)
        if op_type not in (ast.Eq, ast.NotEq, ast.Lt, ast.LtE,
                           ast.Gt, ast.GtE):
            raise ExpressionError(
                f"unsupported comparison operator {op_type.__name__}")
        rf = _operand(right)
        # equality against a literal: the column's bloom (when the
        # partition carries one) can prove the point value absent
        probe = None
        if op_type is ast.Eq:
            if isinstance(left, ast.Name) and not isinstance(right,
                                                             ast.Name):
                probe = (left.id, _literal(right))
            elif isinstance(right, ast.Name) \
                    and not isinstance(left, ast.Name):
                probe = (right.id, _literal(left))
            if probe is not None and isinstance(probe[1], tuple):
                probe = None  # container literal: invalid for Eq anyway

        def part(stats, _lf=lf, _rf=rf, _op=op_type, _p=probe):
            may, must = _cmp_bounds(_op, _lf(stats), _rf(stats))
            if may and _p is not None \
                    and not _bloom_may(stats, _p[0], _p[1]):
                may = False
            return may, must
        parts.append(part)

    def ev(stats, _parts=tuple(parts)):
        pairs = [p(stats) for p in _parts]
        return (all(m for m, _ in pairs), all(u for _, u in pairs))
    return ev


def _walk(node: ast.expr):
    if isinstance(node, ast.BoolOp):
        parts = [_walk(v) for v in node.values]
        conj = isinstance(node.op, ast.And)

        def ev(stats, _p=tuple(parts), _conj=conj):
            pairs = [f(stats) for f in _p]
            if _conj:
                return (all(m for m, _ in pairs), all(u for _, u in pairs))
            return (any(m for m, _ in pairs), any(u for _, u in pairs))
        return ev
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.Not):
        inner = _walk(node.operand)

        def ev(stats, _f=inner):
            may, must = _f(stats)
            return (not must, not may)
        return ev
    if isinstance(node, ast.Compare):
        return _compare(node)
    if isinstance(node, ast.Constant) and isinstance(node.value, bool):
        val = node.value
        return lambda stats, _v=val: (_v, _v)
    raise ExpressionError(
        f"unsupported expression node {type(node).__name__}")


def compile_zone_filter(
        expr: str | None) -> Callable[[Mapping[str, Sequence] | None], bool]:
    """Compile ``expr`` into ``may_match(stats) -> bool``.

    ``stats`` is one partition's ``{col: [min, max, null_count]}`` (or
    None when the partition has no statistics — always kept).  Raises
    :class:`ExpressionError` on grammar violations, same contract as
    ``compile_filter``.
    """
    if expr is None or expr.strip() == "":
        return lambda stats: True  # tautology — compile_filter parity
    try:
        tree = ast.parse(expr, mode="eval")
    except SyntaxError as exc:
        raise ExpressionError(f"invalid expression {expr!r}: {exc}") \
            from None
    fn = _walk(tree.body)

    def may_match(stats: Mapping[str, Sequence] | None) -> bool:
        return fn(stats)[0]

    return may_match
