"""Window helpers shared across query families.

The one export, :func:`tiny_frame_window`, exists for log hygiene: a
handful of queries legitimately rank or running-sum a frame that is
ALREADY bounded tiny by construction (a TakeOrdered ``limit(k)``, a
month grid from one bounds aggregate, a df-capped vocabulary), and a
bare ``Window.orderBy(...)`` there sprays ``WindowExec: No Partition
Defined`` warnings through every sweep log — burying the cases where
that warning flags a REAL unbounded global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def tiny_frame_window(anchor: "str | Column", *order_cols) -> WindowSpec:
    """Ordered window over a frame the CALLER has already bounded tiny.

    Partitions by the constant ``hash(anchor) & 0`` — 0 for every row,
    but computed from a column so it is NOT constant-foldable: the
    partition spec survives optimization (a ``lit(1)`` would be pruned)
    and WindowExec's "No Partition Defined" warning never fires.
    Execution is the same single-task sort an empty partition spec
    produces (every row hashes to one bucket); results are identical
    row-for-row. The point is purely that plan-hygiene logs stay
    reserved for real offenders.

    ``anchor`` is any column of the frame (name or Column, any type) —
    it only feeds the constant-0 hash. NEVER use this on an unbounded
    frame; silencing the warning there hides exactly the scale bug it
    exists to flag.

    With no ``order_cols`` the spec is partition-only: an UNORDERED
    whole-frame aggregate window (``sum(x).over(w)`` spans the full
    tiny frame), NOT the ordered running-frame a default
    ``orderBy(...)`` spec would impose — the q_psi_drift /
    q_temperature_mix "grand total over a handful of group rows"
    shape.
    """
    a = anchor if isinstance(anchor, Column) else F.col(anchor)
    spec = Window.partitionBy(F.hash(a).bitwiseAND(F.lit(0)))
    return spec.orderBy(*order_cols) if order_cols else spec
