"""Cross-engine double rounding.

DuckDB's ``round(double, n)`` (like C++ ``std::round``) rounds HALF AWAY
FROM ZERO evaluated on the floating-point product ``x * 10^n``. Spark's
``F.round`` instead rounds HALF_UP on the decimal string representation
of the double, which diverges on values like ``41/640`` at scale 6
(Spark 0.064063, DuckDB 0.064062 — verified empirically). Every Spark
expression whose output is hash-compared against a DuckDB oracle twin
must therefore use :func:`round_away`, never ``F.round``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_away(col: Column, n: int) -> Column:
    """``sign(x) * floor(|x| * 10^n + 0.5) / 10^n`` — bit-identical to
    DuckDB/numpy half-away-from-zero rounding on the FP product."""
    p = F.lit(float(10**n))
    return F.signum(col) * F.floor(F.abs(col) * p + F.lit(0.5)) / p
