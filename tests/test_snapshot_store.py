"""Versioned snapshot/month-store GC edge cases (review r8)."""

from __future__ import annotations


def test_prune_paths_survive_numeric_named_files(spark, tmp_path):
    """Review r8 second pass: a stray regular FILE named v=N (or
    month=...) is operator debris, not a version — GC must skip it, not
    crash rmtree/listdir mid-loop."""
    import os

    from hours_api_clickup_spark.sinks import versioned as V

    # snapshot store: published v=1, debris file v=0 alongside
    store = str(tmp_path / "snap")
    df = spark.range(3)
    V.write_snapshot(df, store)
    V.write_snapshot(df, store)
    os.rename(
        os.path.join(store, "v=0"), os.path.join(store, "v=0.realdir")
    )
    with open(os.path.join(store, "v=0"), "w") as f:
        f.write("debris")
    removed = V.prune_snapshots(store, keep_last=1)
    assert os.path.exists(os.path.join(store, "v=0"))  # file untouched
    assert V.latest_version(store) == 1

    # month store: debris file month=X and debris file v=9 in a month
    mstore = str(tmp_path / "months")
    os.makedirs(mstore)
    V.write_month_version(df, mstore, "2024-01")
    V.publish_manifest(mstore, {"2024-01": 0})
    with open(os.path.join(mstore, "month=junk"), "w") as f:
        f.write("debris")
    with open(os.path.join(mstore, "month=2024-01", "v=9"), "w") as f:
        f.write("debris")
    removed = V.prune_months(mstore)
    assert removed == []  # nothing referenced was touched, no crash
    # and the debris file does not steal version numbers
    v = V.write_month_version(df, mstore, "2024-01")
    assert v == 1
