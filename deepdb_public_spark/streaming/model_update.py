"""Online RSPN maintenance: absorb a STREAM of inserts (or deletes)
into a trained model, one micro-batch at a time.

The reference's add_dataset (D5) is a one-shot API over a static
delta; at 100 TB the realistic shape is a continuous ingest stream.
``foreachBatch`` is the right Spark construct: each micro-batch is a
plain DataFrame, so the existing distributed delta path
(spn/incremental.py — exact melt+groupBy histogram deltas or a
bounded routed sample, never a data-scale collect) applies verbatim,
and the model object lives on the driver where foreachBatch runs.

Delivery semantics: the checkpoint makes the SOURCE exactly-once, but
a crash BETWEEN applying the delta and committing the batch would
re-apply one batch on restart (at-least-once into the model). For
histogram absorption a duplicate batch skews masses by that batch's
share — acceptable for monitoring-grade estimates; retrain on a
schedule for tight budgets (the reference's guidance for drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..spn.incremental import absorb_delta, remove_delta
from ..spn.model import SPNModel


def maintain_model_stream(
    model: SPNModel,
    stream_df: DataFrame,
    checkpoint_dir: str,
    sample_budget: int = 100_000,
    mode: str = "insert",
    available_now: bool = True,
):
    """Start a streaming query that folds every micro-batch into
    ``model``. Returns the StreamingQuery (caller awaits/stops it);
    with ``available_now`` the query drains the current source
    contents and finishes — the batch-parity shape every streaming
    operator here follows."""
    if mode not in ("insert", "delete"):
        raise ValueError(f"mode must be insert|delete, got {mode!r}")
    apply_fn = absorb_delta if mode == "insert" else remove_delta

    def handle(batch: DataFrame, batch_id: int) -> None:
        apply_fn(model, batch, sample_budget=sample_budget)

    writer = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
