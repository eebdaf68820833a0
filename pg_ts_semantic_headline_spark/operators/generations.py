"""Generation-stamped tombstone deletes, shared by the persisted
secondary indexes (trigram, LSH-ANN, IVF, IVF-PQ).

The contract, identical everywhere it is used:

- every data row carries a `gen` long (0 at build, +1 per ingest batch;
  constant within each written file so parquet RLE makes it ~free);
- a delete appends (id, gen = current max_gen) tombstones — O(deletes);
- a row is DEAD iff some tombstone for its id has tombstone.gen >= the
  row's gen, so re-adding an id after a delete (the replace flow)
  resurrects it with only the new rows visible;
- queries filter through a broadcast of the (small between compactions)
  tombstone set; compaction folds tombstones in and resets gens to 0.

Single-writer assumption: concurrent ingests through separate handles
can collide on generation numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tombstone_max(tombstones: DataFrame, id_col: str) -> DataFrame:
    """(id_col, _tgen): the newest tombstone generation per id."""
    return tombstones.groupBy(id_col).agg(F.max("gen").alias("_tgen"))


def live_rows(df: DataFrame, tombstones: DataFrame | None,
              id_col: str) -> DataFrame:
    """Rows of `df` not superseded by a tombstone (see module contract).
    `df` must carry a `gen` column; broadcast join, no shuffle of df."""
    if tombstones is None:
        return df
    return (df.join(F.broadcast(tombstone_max(tombstones, id_col)),
                    on=id_col, how="left")
            .where(F.col("_tgen").isNull() | (F.col("gen") > F.col("_tgen")))
            .drop("_tgen"))
