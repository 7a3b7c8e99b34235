"""Per-round convergence metrics for the iterative operator family
(round-3 VERDICT ask #7).

Every iterative operator here (pagerank, sssp, k-core peel, closure
doubling, ...) already raises on max_iter instead of silently returning a
non-converged answer; what a 100x-scale run additionally needs is
OBSERVABILITY per round — frontier size, delta count, remaining mass —
so a skewed partition or a stalling frontier surfaces in the metrics
stream long before the wall clock does.

``RoundMetrics`` is the opt-in collector: operators accept
``metrics: RoundMetrics | None = None`` and, when given one, record one
row per round.  The counts come from frames the loops ALREADY
materialize with ``localCheckpoint(eager=True)`` — a count() over a
checkpointed frame is a cheap cached scan, not a recompute — and with
``metrics=None`` (the default) the operators are byte-for-byte the plans
they were before: zero cost unless asked for.

On a production cluster the same rows feed whatever metrics sink the
deployment uses (StreamingQueryListener-style emission, a metrics table,
logs); here they are a plain list plus a DataFrame view for tests and
notebooks.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class RoundMetrics:
    """Collector for one operator run (or several — rows carry the
    operator name)."""

    rows: list[dict] = field(default_factory=list)

    def record(self, op: str, round_idx: int, **counts: int) -> None:
        self.rows.append({"op": op, "round": round_idx, **counts})

    def for_op(self, op: str) -> list[dict]:
        return [r for r in self.rows if r["op"] == op]

    def df(self, spark):
        """Metrics as a DataFrame (op, round, metric, value) — long form
        so heterogeneous operators share one sink schema."""
        long_rows = [
            (r["op"], r["round"], k, int(v))
            for r in self.rows
            for k, v in r.items()
            if k not in ("op", "round")
        ]
        return spark.createDataFrame(
            long_rows, "op string, round int, metric string, value long"
        )
