"""re2-mode regex safety: honor the linear-time contract or reject.

The reference's default engine is RE2 (lib/index.ts:86-95,
lib/engine/objects/regexpCondition.js:37): guaranteed-linear matching, no
backreferences or lookarounds. Python's `re` is a backtracking engine, so
silently substituting it would let one hostile pattern (e.g. ``(a+)+$``)
stall every executor. Policy here:

- if the ``re2`` module is importable, compile with it (true parity);
- otherwise, analyze the pattern's AST (``re._parser``) and REJECT what
  real RE2 rejects (backreferences, lookarounds, ``\\G``-style constructs)
  plus anything with nested unbounded quantifiers (star-height ≥ 2), the
  superlinear-backtracking shape `re` cannot run safely. Everything else
  is linear-safe enough for `re` in practice (single quantifier level).

The ``js`` engine keeps full backtracking semantics, like the reference's
JS fallback — no guard (parity: JS accepts ``(a+)+$``).
"""

from __future__ import annotations

import re

try:  # Python 3.11+: the parser moved under re._parser
    import re._parser as _sre_parse
    import re._constants as _sre_const
except ImportError:  # pragma: no cover - older CPython
    import sre_parse as _sre_parse
    import sre_constants as _sre_const

try:  # true RE2 if the wheel is present
    import re2 as _re2
except ImportError:
    _re2 = None

HAVE_RE2 = _re2 is not None

_MAXREPEAT = _sre_const.MAXREPEAT
_REPEAT_OPS = {_sre_const.MAX_REPEAT, _sre_const.MIN_REPEAT}
_ASSERT_OPS = {_sre_const.ASSERT, _sre_const.ASSERT_NOT}
_GROUPREF_OPS = {
    getattr(_sre_const, n)
    for n in ("GROUPREF", "GROUPREF_EXISTS")
    if hasattr(_sre_const, n)
}


class UnsafePatternError(ValueError):
    """Pattern not allowed under the re2 engine contract."""


_ANY = object()  # sentinel: first-set may match any character


def _first_set(subpattern):
    """Conservative first-character set of a subpattern (or _ANY)."""
    for op, av in subpattern.data:
        if op is _sre_const.LITERAL:
            return {av}
        if op is _sre_const.IN:
            chars = set()
            for iop, iav in av:
                if iop is _sre_const.LITERAL:
                    chars.add(iav)
                elif iop is _sre_const.RANGE:
                    lo, hi = iav
                    if hi - lo > 4096:
                        return _ANY
                    chars.update(range(lo, hi + 1))
                else:  # category / negate — give up precisely
                    return _ANY
            return chars
        if op is _sre_const.SUBPATTERN:
            return _first_set(av[-1])
        if op is _sre_const.AT:  # anchors are zero-width: look further
            continue
        return _ANY
    return _ANY


def _branches_overlap(branches) -> bool:
    sets = [_first_set(b) for b in branches]
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            if a is _ANY or b is _ANY or (a & b):
                return True
    return False


def _walk(subpattern, repeat_depth: int) -> None:
    for op, av in subpattern.data:
        if op in _GROUPREF_OPS:
            raise UnsafePatternError(
                "backreferences are not supported by the re2 engine"
            )
        if op in _ASSERT_OPS:
            raise UnsafePatternError(
                "lookaround assertions are not supported by the re2 engine"
            )
        if op in _REPEAT_OPS:
            _min, _max, body = av
            unbounded = _max == _MAXREPEAT or (isinstance(_max, int) and _max > 100)
            depth = repeat_depth + (1 if unbounded else 0)
            if depth >= 2:
                raise UnsafePatternError(
                    "nested unbounded quantifiers (potential catastrophic "
                    "backtracking) are rejected under the re2 engine; use "
                    "regexp_engine='js' to opt into backtracking semantics"
                )
            _walk(body, depth)
        elif op is _sre_const.SUBPATTERN:
            _walk(av[-1], repeat_depth)
        elif op is _sre_const.BRANCH:
            if repeat_depth >= 1 and _branches_overlap(av[1]):
                # ambiguous alternation under an unbounded repeat, e.g.
                # (a|a)* or (a|ab)+ — exponential for a backtracking engine
                raise UnsafePatternError(
                    "ambiguous alternation inside an unbounded quantifier "
                    "(potential catastrophic backtracking) is rejected under "
                    "the re2 engine; use regexp_engine='js' to opt in"
                )
            for branch in av[1]:
                _walk(branch, repeat_depth)
        elif op is _sre_const.ATOMIC_GROUP:  # pragma: no cover
            _walk(av, repeat_depth)


def check_re2_safe(pattern: str, py_flags: int = 0) -> None:
    """Raise UnsafePatternError if the pattern violates the re2 contract.

    The AST analysis ALWAYS runs: matching is executed with Python ``re``
    in every executor (compiled.py), never with a re2 runtime, so the
    registration-time guard is the only thing standing between a hostile
    pattern and catastrophic backtracking — even on hosts where the re2
    wheel happens to be importable. When the wheel IS present we
    additionally ask real re2 to compile, for exact rejection parity.
    """
    if HAVE_RE2:  # pragma: no cover - wheel not present in this sandbox
        try:
            _re2.compile(pattern)
        except _re2.error as err:
            raise UnsafePatternError(f"re2 rejects this pattern: {err}") from None
    try:
        tree = _sre_parse.parse(pattern, py_flags)
    except re.error:
        return  # compile_js_regex reports syntax errors with better context
    _walk(tree, 0)


