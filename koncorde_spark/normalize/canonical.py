"""Canonicalization: standardized filter tree → minimal OR-of-ANDs (DNF).

Reproduces the observable behavior of the reference canonicalizer
(/root/reference/lib/transform/canonical.ts:61-133): conditions are
extracted from the boolean tree (leaf-flagged and/or groups count as one
truth-table variable), the filter is evaluated over all 2^n assignments and
the ON-set is minimized to a cube cover, cubes are expanded back into
condition lists (cartesian product over embedded or-groups), impossible
AND-clauses are pruned, and each clause is keyword-sorted.

Minimization: the reference uses the Espresso heuristic minimizer (a C
addon). We implement the published Espresso-II pipeline itself
(normalize/espresso.py: EXPAND → IRREDUNDANT → ESSENTIALS → REDUCE loop
→ LAST_GASP over the same fully-specified minterm input) so the cube
SET matches espresso's by construction — including its documented
heuristic picks for cyclic covers, where round-3's QM branch-and-bound
only coincided by accident. The one residual divergence is OR-clause
ORDER (espresso emits its internal order, we sort cube strings); filter
IDs match the reference exactly for single-condition/single-cube filters
and remain stable and deterministic for all filters under our hashing.
"""

from __future__ import annotations

import itertools
import math
from typing import Any

from .standardize import NormalizedExists, get_is_leaf

MAX_TRUTH_TABLE_CONDITIONS = 24  # 2^24 rows ≈ 16M evaluations, hard cap


class FilterTooComplexError(Exception):
    pass


def _clone(filters: Any) -> Any:
    """Deep clone preserving the leaf flag."""
    from .standardize import LeafDict, make_leaf

    if isinstance(filters, list):
        return [_clone(v) for v in filters]
    if isinstance(filters, dict):
        out = {k: _clone(v) for k, v in filters.items()}
        if isinstance(filters, LeafDict):
            return make_leaf(out, filters.is_leaf)
        return out
    return filters


def _extract_conditions(filters: dict, conditions: list | None = None) -> list:
    if conditions is None:
        conditions = []
    key = next(iter(filters), None)
    if key not in ("and", "or", "not"):
        conditions.append(_clone(filters))
        return conditions
    if key == "not":
        return _extract_conditions(filters[key], conditions)
    if get_is_leaf(filters):
        conditions.append(_clone(filters))
        return conditions
    for c in filters[key]:
        _extract_conditions(c, conditions)
    return conditions


def _count_conditions(conditions: list) -> int:
    count = 0
    for condition in conditions:
        key = next(iter(condition), None)
        count += len(condition[key]) if key in ("and", "or", "not") else 1
    return count


def _eval_filter(filters: dict, bits: list[int], pos: list[int]) -> bool:
    key = next(iter(filters), None)
    if key not in ("and", "or", "not") or get_is_leaf(filters):
        pos[0] += 1
        return bool(bits[pos[0] - 1])
    if key == "not":
        return not _eval_filter(filters[key], bits, pos)
    acc = None
    for c in filters[key]:
        r = _eval_filter(c, bits, pos)
        acc = r if acc is None else (acc and r if key == "and" else acc or r)
    return bool(acc)


# ---------------------------------------------------------------------------
# Two-level minimization (Espresso-II pipeline, normalize/espresso.py)
# ---------------------------------------------------------------------------


def _qm_minimize(minterms: set[int], n: int) -> list[str]:
    """Minimize an ON-set of ``n``-variable minterms to a cube cover.

    Returns cube strings over {'0','1','-'} where position i is condition i.
    Delegates to the Espresso-II pipeline (normalize/espresso.py) so the
    cube SET matches the reference's espresso output by construction —
    unique irredundant prime covers are provably identical, and cyclic
    covers follow espresso's documented EXPAND/IRREDUNDANT heuristics
    (pinned in tests/test_dnf_minimization_parity.py). Deterministic: every
    ordering espresso leaves to qsort is pinned to truth-table order.
    (Name kept from the round-1 Quine-McCluskey implementation so external
    callers/tests are unaffected.)
    """
    from .espresso import espresso_minimize

    return espresso_minimize(minterms, n)


_EXACT_COVER_MAX_PRIMES = 26
_EXACT_COVER_MAX_MINTERMS = 2048


def _exact_cover(minterms, primes, covers):
    """Minimum-cardinality prime cover via branch-and-bound.

    Deterministic: the branch order (canonical prime order, fewest-covers-first
    minterm selection) is fixed and the first minimum-size cover found wins.
    Returns None when the residual problem exceeds the feasibility gate
    (caller falls back to greedy).
    """
    if len(primes) > _EXACT_COVER_MAX_PRIMES or len(minterms) > _EXACT_COVER_MAX_MINTERMS:
        return None

    idx = {m: i for i, m in enumerate(minterms)}
    full = (1 << len(minterms)) - 1
    pmasks = []
    for p in primes:
        mask = 0
        for m in minterms:
            if covers(p, m):
                mask |= 1 << idx[m]
        pmasks.append(mask)
    m_primes = [
        [j for j, pm in enumerate(pmasks) if pm >> i & 1] for i in range(len(minterms))
    ]

    best: list[list[int]] = [list(range(len(primes) + 1))]  # sentinel: worse than any

    def search(covered: int, picked: list[int]) -> None:
        if len(picked) >= len(best[0]):
            return
        if covered == full:
            best[0] = list(picked)
            return
        # branch on the uncovered minterm with the fewest covering primes
        tgt = min(
            (i for i in range(len(minterms)) if not covered >> i & 1),
            key=lambda i: len(m_primes[i]),
        )
        for j in m_primes[tgt]:
            if j in picked:
                continue
            picked.append(j)
            search(covered | pmasks[j], picked)
            picked.pop()

    search(0, [])
    return [primes[j] for j in best[0]]


# ---------------------------------------------------------------------------
# JS-semantics helpers for impossible-predicate pruning
# ---------------------------------------------------------------------------


def _js_strict_eq(a: Any, b: Any) -> bool:
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a is b
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return False


def _js_num(v: Any) -> float:
    """JS ToNumber coercion for relational comparison."""
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if v is None:
        return 0.0
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        s = v.strip()
        if s == "":
            return 0.0
        try:
            return float(s)
        except ValueError:
            return float("nan")
    return float("nan")


def _js_ge(a, b):
    x, y = _js_num(a), _js_num(b)
    return not (math.isnan(x) or math.isnan(y)) and x >= y


def _js_gt(a, b):
    x, y = _js_num(a), _js_num(b)
    return not (math.isnan(x) or math.isnan(y)) and x > y


def _js_le(a, b):
    x, y = _js_num(a), _js_num(b)
    return not (math.isnan(x) or math.isnan(y)) and x <= y


def _js_lt(a, b):
    x, y = _js_num(a), _js_num(b)
    return not (math.isnan(x) or math.isnan(y)) and x < y


def _js_key(v: Any) -> str:
    """JS object-key stringification (used by the notequals seen-set)."""
    from .jsonstable import js_number_repr

    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, (int, float)):
        return js_number_repr(float(v))
    return str(v)


class Canonical:
    """Converts standardized filters to canonical DNF."""

    def __init__(self, max_conditions: int = 50):
        self.max_conditions = max_conditions

    def convert(self, filters: dict) -> list[list[dict]]:
        if len(filters) == 0:
            return [[{"everything": True}]]

        conditions = _extract_conditions(filters)
        count = _count_conditions(conditions)
        if self.max_conditions and count > self.max_conditions:
            raise FilterTooComplexError(
                f"Filter too complex: exceeds the configured maximum number of "
                f"conditions (conditions: {count}, max: {self.max_conditions})"
            )

        cubes = self._normalize(filters, conditions)

        result: list[list[dict]] = []
        for cube in cubes:
            ors: list[list[dict]] = []
            subresult: list[dict] = []
            for i, ch in enumerate(cube):
                if ch == "-":
                    continue
                positive = ch == "1"
                sub = _clone(conditions[i])
                sub["not"] = not positive
                group = sub.get("or") or sub.get("and")
                if group is not None:
                    conds = self._not_and_or(group) if sub["not"] else self._and_or(group)
                    is_and_like = ("and" in sub and not sub["not"]) or (
                        "or" in sub and sub["not"]
                    )
                    if is_and_like:
                        subresult.extend(conds)
                    else:
                        ors.append(conds)
                else:
                    subresult.append(sub)
            if not ors and subresult:
                result.append(subresult)
            elif ors:
                for combo in itertools.product(*ors):
                    result.append(subresult + [_clone(c) for c in combo])

        result = self._remove_impossible_predicates(result)

        for sub in result:
            sub.sort(key=lambda c: next(k for k in c if k != "not"))
        return result

    def _normalize(self, filters: dict, conditions: list) -> list[str]:
        n = len(conditions)
        if n == 1:
            zero = _eval_filter(filters, [0], [0])
            one = _eval_filter(filters, [1], [0])
            if not zero and not one:
                return []
            if not zero and one:
                return ["1"]
            if zero and not one:
                return ["0"]
            return ["-"]
        if n > MAX_TRUTH_TABLE_CONDITIONS:
            raise FilterTooComplexError(
                f"Filter too complex: {n} truth-table conditions exceeds the "
                f"supported maximum of {MAX_TRUTH_TABLE_CONDITIONS}"
            )
        minterms = set()
        for row in range(1 << n):
            bits = [(row >> i) & 1 for i in range(n)]
            if _eval_filter(filters, bits, [0]):
                minterms.add(row)
        # Our cube strings index condition i at position i; _qm_minimize's
        # bit i is condition i, matching the bits list above.
        return _qm_minimize(minterms, n)

    @staticmethod
    def _and_or(conds: list[dict]) -> list[dict]:
        out = []
        for c in conds:
            if c.get("not"):
                inner = dict(c["not"])
                inner["not"] = True
                out.append(inner)
            else:
                cc = dict(c)
                cc["not"] = False
                out.append(cc)
        return out

    @staticmethod
    def _not_and_or(conds: list[dict]) -> list[dict]:
        out = []
        for c in conds:
            if c.get("not"):
                inner = dict(c["not"])
                inner["not"] = False
                out.append(inner)
            else:
                cc = dict(c)
                cc["not"] = True
                out.append(cc)
        return out

    @staticmethod
    def _remove_impossible_predicates(ors: list[list[dict]]) -> list[list[dict]]:
        result = []
        for ands in ors:
            seen_equals: dict[str, Any] = {}
            seen_exists: dict[str, bool] = {}
            seen_notequals: dict[str, dict[str, bool]] = {}
            seen_notexists: dict[str, bool] = {}
            seen_range: dict[str, dict] = {}
            skip = False

            for sub in ands:
                operator = None
                field = None
                value = None
                for prop in sub:
                    if prop == "not":
                        continue
                    operator = prop
                    if operator == "exists":
                        field = sub[prop].path if isinstance(sub[prop], NormalizedExists) else None
                        value = None
                    else:
                        spec = sub[prop]
                        field = next(iter(spec)) if isinstance(spec, dict) and spec else None
                        value = spec.get(field) if isinstance(spec, dict) else None

                if operator == "equals" and sub.get("not") is False:
                    if field in seen_equals and not _js_strict_eq(seen_equals[field], value):
                        skip = True
                        break
                    seen_equals[field] = value
                    rng = seen_range.get(field)
                    if (
                        seen_notexists.get(field)
                        or (field in seen_notequals and seen_notequals[field].get(_js_key(value)))
                        or (
                            rng is not None
                            and (
                                ("lt" in rng and _js_ge(value, rng["lt"]))
                                or ("lte" in rng and _js_gt(value, rng["lte"]))
                                or ("gt" in rng and _js_le(value, rng["gt"]))
                                or ("gte" in rng and _js_lt(value, rng["gte"]))
                            )
                        )
                    ):
                        skip = True
                        break
                elif operator == "equals" and sub.get("not") is True:
                    seen_notequals.setdefault(field, {})[_js_key(value)] = True
                    if field in seen_equals and _js_strict_eq(seen_equals[field], value):
                        skip = True
                        break
                elif operator == "exists" and sub.get("not") is False:
                    seen_exists[field] = True
                    if seen_notexists.get(field):
                        skip = True
                        break
                elif operator == "exists" and sub.get("not") is True:
                    seen_notexists[field] = True
                    if field in seen_equals or seen_exists.get(field) or field in seen_range:
                        skip = True
                        break
                elif operator == "range" and sub.get("not") is False:
                    # naive: keep only the last range; "not" ranges untested
                    seen_range[field] = value
                    eq = seen_equals.get(field)
                    if seen_notexists.get(field) or (
                        field in seen_equals
                        and (
                            ("lt" in value and _js_ge(eq, value["lt"]))
                            or ("lte" in value and _js_gt(eq, value["lte"]))
                            or ("gt" in value and _js_le(eq, value["gt"]))
                            or ("gte" in value and _js_lt(eq, value["gte"]))
                        )
                    ):
                        skip = True
                        break

            if not skip:
                result.append(ands)

        if not result:
            return [[{"nothing": True}]]
        return result
