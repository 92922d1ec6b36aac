"""Espresso-II style two-level minimization over explicit minterm sets.

The reference minimizes each filter's truth table with the Espresso
heuristic minimizer (/root/reference/lib/transform/canonical.ts:266-274
pushes the full 2^n table into `kuzzle-espresso-logic-minimizer`, a
binding of the classic Berkeley Espresso-II C program). The native addon
cannot run in this sandbox, so this module re-implements the PUBLISHED
Espresso-II algorithm (Brayton, Hachtel, McMullen, Sangiovanni-Vincentelli,
"Logic Minimization Algorithms for VLSI Synthesis", 1984) for the exact
regime the reference uses it in: single-output, fully-specified functions
(ON-set = rows evaluating true, OFF-set = the rest, empty DC-set),
presented as one minterm per truth-table row.

Pipeline (mirrors espresso.c's main loop):

    F  = EXPAND(minterm cubes)          # each cube grown to a prime
    F  = IRREDUNDANT(F)
    E  = ESSENTIAL_PRIMES(F); F -= E    # essentials held as don't-care
    do {
        do { REDUCE; EXPAND; IRREDUNDANT } while cost decreases
        LAST_GASP
    } while LAST_GASP improved
    return E + F

Documented heuristics reproduced (with the determinism espresso leaves to
qsort pinned to input/truth-table order):

- EXPAND processes cubes in ASCENDING "mini" weight (inner product of the
  cube's positional vector with the cover's column counts) — cubes in
  sparse regions, least likely to be covered by another expansion, go
  first (book §4.10); ties keep truth-table order. Each raise picks the
  feasible part covering the most still-active cubes of F, ties to the
  lowest column index, and keeps raising until the cube is prime. Cubes
  covered by the new prime are dropped from the expansion queue.
- IRREDUNDANT splits the cover into relatively-essential / partially- /
  totally-redundant cubes and solves the residual minimum-cover exactly
  (espresso's mincov is an exact branch-and-bound with a max-independent-
  set bound; `_exact_cover` in canonical.py plays that role, fed in cover
  order) with a greedy fallback past the feasibility gate.
- ESSENTIAL primes use the exact minterm test: prime c is essential iff
  it covers a minterm m whose every neighbor across a variable FIXED in c
  lies outside the ON-set (equivalent to the book's consensus test
  §4.4: no other prime can cover m).
- REDUCE processes cubes largest-first (ties truth-table order),
  sequentially replacing each cube by the smallest cube containing the
  minterms only it covers (the fully-specified-function form of the
  smallest-cube-containing-complement-cofactor), dropping cubes reduced
  to nothing.
- LAST_GASP reduces every cube independently against the full cover,
  expands each non-degenerate reduction targeting coverage of OTHER
  reduced cubes, keeps expansions that cover at least one other reduced
  cube, and accepts the round only if IRREDUNDANT over the augmented
  cover lowers the cost.

Output cubes are strings over {'0','1','-'} with position i = condition i
(bit i of a minterm), sorted — OR-clause order is the one documented
divergence left vs the reference (espresso emits its internal order and
the reference hashes it; see SURVEY §8).

Cost = (#cubes, #fixed literals), compared lexicographically, exactly
espresso's primary/secondary cost.
"""

from __future__ import annotations

Cube = tuple[int, int]  # (value, mask); mask bit i set = variable i free

_FORCE_GENERIC_EXPAND = False  # test-only: disable the minterm fast path


def _cube_minterms(cube: Cube) -> list[int]:
    v, mask = cube
    out = []
    sub = mask  # enumerate submasks of the free mask, OR each into the base
    while True:
        out.append(v | sub)
        if sub == 0:
            break
        sub = (sub - 1) & mask
    return out


def _covers(big: Cube, small: Cube) -> bool:
    """big ⊇ small: every var fixed in big is fixed identically in small."""
    bv, bm = big
    sv, sm = small
    fixed_big = ~bm
    return (sm & fixed_big) == 0 and ((bv ^ sv) & fixed_big) == 0


def _feasible_raise(cube: Cube, var_bit: int, onset: frozenset[int]) -> bool:
    """Freeing var_bit keeps the cube an implicant: the flipped half's
    minterms must all lie in the ON-set (the current half already does)."""
    v, mask = cube
    flipped = (v ^ var_bit, mask)
    return all(m in onset for m in _cube_minterms(flipped))


def _cube_str(cube: Cube, n: int) -> str:
    v, mask = cube
    return "".join(
        "-" if mask >> i & 1 else ("1" if v >> i & 1 else "0") for i in range(n)
    )


def _bounding_box(minterms: list[int], n: int) -> Cube:
    """Smallest cube containing the minterms."""
    ones = 0
    zeros = 0
    for m in minterms:
        ones |= m
        zeros |= ~m
    mask = ones & zeros & ((1 << n) - 1)  # vars that vary
    return (minterms[0] & ~mask, mask)


def _cost(cover: list[Cube], n: int) -> tuple[int, int]:
    return (len(cover), sum(n - bin(mask).count("1") for _, mask in cover))


# ---------------------------------------------------------------------------
# EXPAND
# ---------------------------------------------------------------------------


def _expand(cover: list[Cube], onset: frozenset[int], n: int) -> list[Cube]:
    """Grow every cube to a prime, mini weight order, dropping covered cubes.

    Raise selection: among feasible raises, the one whose expansion covers
    the most still-active cubes of the cover (ties: lowest variable index);
    raising continues until no raise is feasible, so results are prime.
    """
    # column counts in positional-cube notation: a free var sets both parts
    counts = [[0, 0] for _ in range(n)]
    for v, mask in cover:
        for i in range(n):
            if mask >> i & 1:
                counts[i][0] += 1
                counts[i][1] += 1
            else:
                counts[i][v >> i & 1] += 1

    def weight(cube: Cube) -> int:
        v, mask = cube
        w = 0
        for i in range(n):
            if mask >> i & 1:
                w += counts[i][0] + counts[i][1]
            else:
                w += counts[i][v >> i & 1]
        return w

    order = sorted(range(len(cover)), key=lambda j: (weight(cover[j]), j))
    active = [True] * len(cover)
    result: list[Cube] = []

    # Fast path for the first EXPAND (every cube a minterm): gain for a
    # candidate raise = active minterms in the FLIPPED half (counting
    # active minterms already inside the current half shifts every
    # candidate's gain by the same constant, so argmax and ties are
    # unchanged), and feasibility is checked in the same enumeration.
    # _FORCE_GENERIC_EXPAND lets the equivalence fuzz test pin that both
    # paths emit identical covers.
    is_minterm_pass = not _FORCE_GENERIC_EXPAND and all(
        mask == 0 for _, mask in cover
    )
    if is_minterm_pass:
        idx_of = {v: k for k, (v, _) in enumerate(cover)}
        active_set = {v for v, _ in cover}

        for j in order:
            if not active[j]:
                continue
            cur = cover[j]
            while True:
                v, mask = cur
                best_var = -1
                best_gain = -1
                for i in range(n):
                    bit = 1 << i
                    if mask & bit:
                        continue
                    gain = 0
                    feasible = True
                    for m in _cube_minterms((v ^ bit, mask)):
                        if m not in onset:
                            feasible = False
                            break
                        if m in active_set:
                            gain += 1
                    if feasible and gain > best_gain:
                        best_gain = gain
                        best_var = i
                if best_var < 0:
                    break
                bit = 1 << best_var
                cur = (v & ~bit, mask | bit)
            for m in _cube_minterms(cur):
                if m in active_set:
                    active_set.discard(m)
                    active[idx_of[m]] = False
            result.append(cur)
        return result

    for j in order:
        if not active[j]:
            continue
        cur = cover[j]
        while True:
            v, mask = cur
            best_var = -1
            best_gain = -1
            for i in range(n):
                bit = 1 << i
                if mask & bit:
                    continue
                if not _feasible_raise(cur, bit, onset):
                    continue
                cand = (v & ~bit, mask | bit)
                gain = sum(
                    1
                    for k in range(len(cover))
                    if active[k] and k != j and _covers(cand, cover[k])
                )
                if gain > best_gain:
                    best_gain = gain
                    best_var = i
            if best_var < 0:
                break
            bit = 1 << best_var
            cur = (v & ~bit, mask | bit)
        for k in range(len(cover)):
            if active[k] and _covers(cur, cover[k]):
                active[k] = False
        result.append(cur)
    return result


# ---------------------------------------------------------------------------
# IRREDUNDANT
# ---------------------------------------------------------------------------


def _irredundant(
    cover: list[Cube], required: frozenset[int], n: int
) -> list[Cube]:
    """Minimum-cardinality subcover of `required`, keeping cover order.

    Relatively-essential cubes (sole coverer of some required minterm) are
    kept; the residual minimum cover over the partially-redundant cubes is
    exact (branch-and-bound, as espresso's mincov) within the feasibility
    gate, greedy beyond it. Totally redundant cubes are dropped.
    """
    from .canonical import _exact_cover

    if not required:
        return []
    req = sorted(required)
    covering: dict[int, list[int]] = {m: [] for m in req}
    for idx, c in enumerate(cover):
        for m in _cube_minterms(c):
            if m in covering:
                covering[m].append(idx)

    keep = set()
    for m, idxs in covering.items():
        if len(idxs) == 1:
            keep.add(idxs[0])
    uncovered = {
        m for m, idxs in covering.items() if not any(i in keep for i in idxs)
    }
    if uncovered:
        residual = [
            i
            for i in range(len(cover))
            if i not in keep and any(m in uncovered for m in _cube_minterms(cover[i]))
        ]

        def covers_m(i: int, m: int) -> bool:
            v, mask = cover[i]
            return (m & ~mask) == (v & ~mask)

        exact = _exact_cover(sorted(uncovered), residual, covers_m)
        if exact is not None:
            keep.update(exact)
        else:
            rest = set(uncovered)
            while rest:
                best = max(
                    residual,
                    key=lambda i: (
                        sum(1 for m in rest if covers_m(i, m)),
                        -i,
                    ),
                )
                keep.add(best)
                rest -= {m for m in rest if covers_m(best, m)}
    return [c for i, c in enumerate(cover) if i in keep]


# ---------------------------------------------------------------------------
# ESSENTIAL primes / REDUCE / LAST_GASP
# ---------------------------------------------------------------------------


def _essentials(cover: list[Cube], onset: frozenset[int], n: int) -> list[Cube]:
    """True essential primes: c is essential iff some minterm of c has all
    its neighbors across c's FIXED variables outside the ON-set — then no
    other prime can contain that minterm (any prime != c containing m must
    free a variable fixed in c, which requires m's neighbor in the ON-set).
    """
    out = []
    for c in cover:
        v, mask = c
        fixed_bits = [1 << i for i in range(n) if not mask >> i & 1]
        for m in _cube_minterms(c):
            if all((m ^ bit) not in onset for bit in fixed_bits):
                out.append(c)
                break
    return out


def _reduce(
    cover: list[Cube], dc: list[Cube], n: int
) -> list[Cube]:
    """Sequentially shrink each cube (largest first, ties input order) to
    the smallest cube containing the minterms only it covers; drop cubes
    reduced to nothing."""
    order = sorted(
        range(len(cover)), key=lambda j: (-bin(cover[j][1]).count("1"), j)
    )
    current: dict[int, Cube | None] = dict(enumerate(cover))
    for j in order:
        c = current[j]
        assert c is not None
        others = [x for k, x in current.items() if k != j and x is not None] + dc
        mine = [
            m
            for m in _cube_minterms(c)
            if not any(_covers(o, (m, 0)) for o in others)
        ]
        current[j] = _bounding_box(mine, n) if mine else None
    return [current[j] for j in range(len(cover)) if current[j] is not None]


def _last_gasp(
    cover: list[Cube],
    dc: list[Cube],
    onset: frozenset[int],
    required: frozenset[int],
    n: int,
) -> list[Cube] | None:
    """One LAST_GASP round: independent reduce, expand the reduced cubes
    toward covering OTHER reduced cubes, keep expansions covering >=1
    other, re-IRREDUNDANT; return the new cover iff it lowers the cost."""
    reduced: list[Cube] = []
    for j, c in enumerate(cover):
        others = [x for k, x in enumerate(cover) if k != j] + dc
        mine = [
            m
            for m in _cube_minterms(c)
            if not any(_covers(o, (m, 0)) for o in others)
        ]
        if mine:
            reduced.append(_bounding_box(mine, n))
    new_primes: list[Cube] = []
    for j, c in enumerate(reduced):
        cur = c
        while True:
            v, mask = cur
            best_var = -1
            best_gain = -1
            for i in range(n):
                bit = 1 << i
                if mask & bit:
                    continue
                if not _feasible_raise(cur, bit, onset):
                    continue
                cand = (v & ~bit, mask | bit)
                gain = sum(
                    1 for k, d in enumerate(reduced) if k != j and _covers(cand, d)
                )
                if gain > best_gain:
                    best_gain = gain
                    best_var = i
            if best_var < 0:
                break
            bit = 1 << best_var
            cur = (v & ~bit, mask | bit)
        if any(_covers(cur, d) for k, d in enumerate(reduced) if k != j):
            new_primes.append(cur)
    if not new_primes:
        return None
    candidate = _irredundant(cover + new_primes, required, n)
    if _cost(candidate, n) < _cost(cover, n):
        return candidate
    return None


# ---------------------------------------------------------------------------
# main loop
# ---------------------------------------------------------------------------


def espresso_minimize(minterms: set[int], n: int) -> list[str]:
    """Espresso-II style minimization of an ON-set of n-variable minterms.

    Returns sorted cube strings over {'0','1','-'} (position i =
    condition/variable i). Deterministic: every order espresso leaves to
    qsort is pinned to truth-table order here.
    """
    if not minterms:
        return []
    if len(minterms) == (1 << n):
        return ["-" * n]

    onset = frozenset(minterms)
    F: list[Cube] = [(m, 0) for m in sorted(minterms)]
    F = _expand(F, onset, n)
    F = _irredundant(F, onset, n)
    E = _essentials(F, onset, n)
    e_set = set(E)
    F = [c for c in F if c not in e_set]
    dc_covered = {m for c in E for m in _cube_minterms(c)}
    required = frozenset(m for m in onset if m not in dc_covered)

    if required:
        best = F
        while True:
            while True:
                cost = _cost(F, n)
                F = _reduce(F, E, n)
                F = _expand(F, onset, n)
                F = _irredundant(F, required, n)
                if _cost(F, n) < cost:
                    if _cost(F, n) < _cost(best, n):
                        best = F
                else:
                    break
            F = best
            gasp = _last_gasp(F, E, onset, required, n)
            if gasp is None:
                break
            F = best = gasp
        F = best

    return sorted(set(_cube_str(c, n) for c in E + F))
