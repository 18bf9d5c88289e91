"""Lineage control for driver-driven iterative fixpoint loops (PageRank,
k-core peeling, core decomposition, large/small-star CC).

Two failure modes threaten an iterative Spark loop:

1. **Plan growth** — each round's output feeds the next round's plan; after
   a few dozen rounds Catalyst analysis time, not data, becomes the wall.
   `localCheckpoint` per round fixes this, and is all the small-scale path
   needs.
2. **Executor loss** — localCheckpoint stores blocks in executor memory
   with no lineage to rebuild them. On a preemptible 100-TB cluster, one
   lost executor after block eviction kills the job and restarts the WHOLE
   iteration history (round-5 verdict, what's-wrong #3). The document
   pipeline already learned this lesson for stage intermediates
   (plans/pipeline.py intermediates='auto'); this module gives the graph
   loops the same durable option: route the loop state through a
   CheckpointManager stage every `commit_every` rounds. A relaunched job
   resumes from the last committed round instead of round zero, and the
   committed state is a parquet snapshot (compressed, columnar,
   re-readable by any executor) rather than single-replica executor
   blocks.

The per-round state these loops carry is exact under a parquet round-trip
(integer edge/estimate tables; PageRank ranks are rounded to fixed dp each
round, and doubles round-trip bit-exactly), so a resumed run's output is
hash-identical to an uninterrupted one — the resume tests assert exactly
that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class LoopCheckpointer:
    """Per-round state handling for a driver-driven loop.

    Without a manager: `save` is localCheckpoint (pattern 1 above).
    With (manager, stage, commit_every > 0): every commit_every-th round
    also commits the state durably, tagged with its round index, and
    `resume()` restores (next_round, state) from the last committed round.
    Old round snapshots are expired down to keep_last (the current one is
    always kept), so the durable loop costs O(keep_last) snapshots of
    disk, not O(rounds).

    `stage` must uniquely name (operator, input) within the manager's
    workdir — resuming someone else's state is silently wrong, exactly
    like reusing a streaming checkpoint dir across queries.
    """

    def __init__(
        self,
        manager=None,
        stage: str | None = None,
        commit_every: int = 0,
        keep_last: int = 2,
    ):
        if (manager is not None) and (not stage or commit_every <= 0):
            raise ValueError(
                "durable loop checkpointing needs stage and commit_every > 0"
            )
        self.manager = manager
        self.stage = stage
        self.commit_every = commit_every
        self.keep_last = keep_last
        self.on = manager is not None

    def resume(self) -> tuple[int, DataFrame] | None:
        """(next_round_index, restored_state) from the last committed
        round, or None when there is nothing to resume."""
        if not self.on or not self.manager.is_done(self.stage):
            return None
        meta = self.manager.current_meta(self.stage)
        it = meta.get("iteration") if meta else None
        if it is None:
            return None
        return it + 1, self.manager.read(self.stage)

    def save(self, round_index: int, df: DataFrame) -> DataFrame:
        """Truncate lineage for this round's state; durably commit it when
        the round hits the commit_every cadence. Returns the frame the next
        round must consume (the re-read, for a durable commit)."""
        if self.on and (round_index + 1) % self.commit_every == 0:
            out = self.manager.commit(
                self.stage, df, extra_meta={"iteration": round_index}
            )
            self.manager.expire_snapshots(self.stage, keep_last=self.keep_last)
            return out
        return df.localCheckpoint(eager=True)
