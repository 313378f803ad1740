"""transformWithState user ledger (streaming/tws.py).

The processor's fold logic is pinned against the batch aggregate
through a fake-state harness (always runs); the end-to-end streaming
run needs google.protobuf for the state-server protocol and auto-skips
where it is missing (see the module docstring's sandbox boundary).
"""

from __future__ import annotations

import math

import pandas as pd
import pyarrow.parquet as pq
import pytest

from hours_api_clickup_spark.streaming.tws import (
    UserLedgerProcessor,
    resolve_final_ledger,
    streaming_user_ledger,
    tws_available,
)
from tests.conftest import SF_DIR_SMOKE


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class FakeMapState:
    def __init__(self):
        self._m: dict = {}

    def exists(self):
        return bool(self._m)

    def containsKey(self, k):
        return tuple(k) in self._m

    def getValue(self, k):
        return self._m[tuple(k)]

    def updateValue(self, k, v):
        self._m[tuple(k)] = tuple(v)

    def keys(self):
        return iter(self._m.keys())

    def values(self):
        return iter(self._m.values())

    def iterator(self):
        return iter(self._m.items())

    def removeKey(self, k):
        self._m.pop(tuple(k), None)

    def clear(self):
        self._m.clear()


class FakeHandle:
    def getValueState(self, name, schema, ttlDurationMs=None):
        return FakeValueState()

    def getMapState(self, name, kschema, vschema, ttlDurationMs=None):
        return FakeMapState()


def _events_pdf() -> pd.DataFrame:
    pdf = pq.read_table(
        f"{SF_DIR_SMOKE}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value"],
    ).to_pandas()
    pdf["cents"] = pdf["value"].map(
        lambda v: 0 if v is None or (isinstance(v, float) and math.isnan(v))
        else int(math.floor(v * 100 + 0.5))
    )
    return pdf


def test_ledger_fold_equals_batch_aggregate_across_batches():
    """Replaying the corpus through the processor in 3 micro-batches
    (any split — the folds are commutative) must land on the batch
    GROUP BY user_id aggregate, with max_by(n_events) resolution."""
    pdf = _events_pdf()
    procs: dict[int, UserLedgerProcessor] = {}
    last_emission: dict[int, tuple] = {}

    for b in range(3):
        batch = pdf[pdf["event_id"] % 3 == b]
        for user_id, grp in batch.groupby("user_id"):
            p = procs.get(user_id)
            if p is None:
                p = UserLedgerProcessor()
                p.init(FakeHandle())
                procs[user_id] = p
            outs = list(
                p.handleInputRows(
                    (int(user_id),),
                    iter([grp[["event_type", "cents"]]]),
                    None,
                )
            )
            assert len(outs) == 1 and len(outs[0]) == 1
            row = outs[0].iloc[0]
            last_emission[int(user_id)] = (
                int(row["n_events"]),
                int(row["sum_cents"]),
                int(row["n_types"]),
            )

    want = (
        pdf.groupby("user_id")
        .agg(
            n_events=("event_id", "size"),
            sum_cents=("cents", "sum"),
            n_types=("event_type", "nunique"),
        )
        .reset_index()
    )
    assert len(last_emission) == len(want)
    for _, w in want.iterrows():
        got = last_emission[int(w["user_id"])]
        assert got == (
            int(w["n_events"]),
            int(w["sum_cents"]),
            int(w["n_types"]),
        ), w["user_id"]


@pytest.mark.skipif(
    not tws_available(),
    reason="google.protobuf absent — transformWithState state-server "
    "protocol cannot run in this sandbox",
)
def test_streaming_ledger_equals_batch(spark, tmp_path):
    import uuid

    from pyspark.sql import functions as F

    from hours_api_clickup_spark.plans.registry import load_table
    from hours_api_clickup_spark.streaming.tws import ROCKSDB_PROVIDER

    ev = load_table(spark, SF_DIR_SMOKE, "events")
    stage = str(tmp_path / "stage")
    ev.repartition(4).write.mode("overwrite").parquet(stage)
    schema = spark.read.parquet(stage).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(stage)
    )
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    try:
        out = streaming_user_ledger(stream)
        sink = f"tws_test_{uuid.uuid4().hex[:6]}"
        q = (
            out.writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        final = resolve_final_ledger(spark.table(sink))
        want = ev.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.coalesce(
                    F.floor(F.col("value") * 100 + 0.5).cast("bigint"),
                    F.lit(0),
                )
            ).alias("sum_cents"),
            F.countDistinct("event_type").alias("n_types"),
        )
        assert final.exceptAll(want).count() == 0
        assert want.exceptAll(final).count() == 0
    finally:
        if prev is None:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
