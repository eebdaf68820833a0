"""Shared foreachBatch wiring for the streaming attachers (incremental
indexers, decontaminator, pattern percolator): one place for the
empty-batch skip, checkpoint option, availableNow trigger, and optional
terminate-time cleanup — so restart/trigger semantics can never drift
between attachers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def start_foreach_batch(stream_df: DataFrame, batch_fn,
                        checkpoint_dir: str | None,
                        trigger_available_now: bool = True,
                        on_terminated=None):
    """Start `stream_df` with foreachBatch(batch_fn); empty batches are
    skipped before `batch_fn` runs. `on_terminated` (optional zero-arg
    callable) fires once when THIS query terminates — used to release
    resources cached for the stream's lifetime (e.g. the decontaminator's
    eval hash set) — via a self-removing StreamingQueryListener."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_fn(batch_df, batch_id)

    writer = stream_df.writeStream.foreachBatch(handle)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if on_terminated is not None:
        from pyspark.sql.streaming import StreamingQueryListener

        spark = stream_df.sparkSession
        qid = str(query.id)

        class _Cleanup(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                pass

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                if str(event.id) != qid:
                    return
                try:
                    on_terminated()
                finally:
                    try:
                        spark.streams.removeListener(listener)
                    except Exception:
                        pass

        listener = _Cleanup()
        spark.streams.addListener(listener)
    return query
