"""Rebuild writers are maintenance (r9, completing VERDICT r8 #2).

The r8 lease covered compacts and streaming-ingest batches; the full
REBUILD writers were the remaining unleased maintainer — a standalone
``lsh_index_write`` racing a streaming ingest silently discarded its
in-flight batches. And independent of racing, a rebuild OVER a live
merge-on-read index was a latent silent wrong answer: the rebuild's
fresh ``seq=0`` rows are outranked by any stale log entry (max-seq
fold) and killed by any existing tombstone (survival requires
``seq > tombstone seq``). Three families (LSH/IVF/text) now refuse
that state loudly — compact first, or build into a fresh path; the
IVFADC family, whose documented compaction IS the two-tier rebuild,
instead CONSUMES the tiers transactionally under a commit marker that
rolls crashes forward.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import hours_api_clickup_spark.datapipe.similarity as S
from hours_api_clickup_spark.plans.registry import load_table
from tests.conftest import SF_DIR_SMOKE


def _emb(spark):
    return load_table(spark, SF_DIR_SMOKE, "embeddings")


def _docs(spark):
    return load_table(spark, SF_DIR_SMOKE, "documents")


class TestRebuildWritersLeaseGuarded:
    """Every full-rebuild writer (and the in-place upserts) refuses
    while another maintainer holds the index lease."""

    def _refuses_then_succeeds(self, spark, path, op):
        S._acquire_lease(spark, path, "simulated-maintainer")
        try:
            with pytest.raises(S.MaintenanceLeaseHeld, match="lease"):
                op()
        finally:
            S._release_lease(spark, path)
        op()  # released: the same call goes through

    def test_lsh_write_and_upsert(self, spark, tmp_path):
        emb = _emb(spark)
        p = str(tmp_path / "lsh")
        self._refuses_then_succeeds(
            spark, p,
            lambda: S.lsh_index_write(emb, "embedding", "vec_id", p, dim=64),
        )
        self._refuses_then_succeeds(
            spark, p,
            lambda: S.lsh_index_upsert(
                emb.limit(5), "embedding", "vec_id", p, dim=64
            ),
        )

    def test_ivf_write_and_upsert(self, spark, tmp_path):
        emb = _emb(spark)
        cents = S.seed_centroids(emb, "embedding", "vec_id", n_clusters=4)
        p = str(tmp_path / "ivf")
        self._refuses_then_succeeds(
            spark, p,
            lambda: S.ivf_index_write(emb, "embedding", "vec_id", p, cents),
        )
        self._refuses_then_succeeds(
            spark, p,
            lambda: S.ivf_index_upsert(
                emb.limit(5), "embedding", "vec_id", p, cents
            ),
        )

    def test_text_write(self, spark, tmp_path):
        from hours_api_clickup_spark.datapipe.textindex import (
            inverted_index_write,
        )

        docs = _docs(spark)
        p = str(tmp_path / "txt")
        self._refuses_then_succeeds(
            spark, p,
            lambda: inverted_index_write(docs, "text", "doc_id", p),
        )

    def test_doc_neardup_write(self, spark, tmp_path):
        from hours_api_clickup_spark.datapipe.dedup import (
            doc_neardup_index_write,
        )

        docs = _docs(spark)
        p = str(tmp_path / "nd")
        self._refuses_then_succeeds(
            spark, p,
            lambda: doc_neardup_index_write(docs, "doc_id", "text", p),
        )


class TestRebuildRefusesStaleMorTiers:
    """LSH/IVF/text rebuilds refuse while a log or tombstone tier
    exists: the seq=0 rebuild would be outranked/killed silently.
    After the family's compact consumes the tiers, the same rebuild
    goes through."""

    def test_lsh(self, spark, tmp_path):
        emb = _emb(spark)
        p = str(tmp_path / "lsh")
        S.lsh_index_write(emb, "embedding", "vec_id", p, dim=64)
        S.lsh_index_append(emb.limit(3), "embedding", "vec_id", p, dim=64)
        with pytest.raises(ValueError, match="merge-on-read"):
            S.lsh_index_write(emb, "embedding", "vec_id", p, dim=64)
        S.lsh_index_compact(spark, p)
        S.lsh_index_delete(spark, p, [0])
        with pytest.raises(ValueError, match="tombstones"):
            S.lsh_index_write(emb, "embedding", "vec_id", p, dim=64)
        S.lsh_index_compact(spark, p)
        S.lsh_index_write(emb, "embedding", "vec_id", p, dim=64)

    def test_ivf(self, spark, tmp_path):
        emb = _emb(spark)
        cents = S.seed_centroids(emb, "embedding", "vec_id", n_clusters=4)
        p = str(tmp_path / "ivf")
        S.ivf_index_write(emb, "embedding", "vec_id", p, cents)
        S.ivf_index_append(emb.limit(3), "embedding", "vec_id", p, cents)
        with pytest.raises(ValueError, match="merge-on-read"):
            S.ivf_index_write(emb, "embedding", "vec_id", p, cents)
        S.ivf_index_compact(spark, p, "vec_id")
        S.ivf_index_write(emb, "embedding", "vec_id", p, cents)

    def test_text(self, spark, tmp_path):
        from hours_api_clickup_spark.datapipe.textindex import (
            inverted_index_append,
            inverted_index_compact,
            inverted_index_write,
        )

        docs = _docs(spark)
        p = str(tmp_path / "txt")
        inverted_index_write(docs, "text", "doc_id", p)
        inverted_index_append(docs.limit(3), "text", "doc_id", p)
        with pytest.raises(ValueError, match="merge-on-read"):
            inverted_index_write(docs, "text", "doc_id", p)
        inverted_index_compact(spark, p)
        inverted_index_write(docs, "text", "doc_id", p)

    def test_upsert_still_folds_tiers_itself(self, spark, tmp_path):
        """The upserts keep their own fold-first behavior (they compact
        via the unlocked core under one lease) — no refusal there."""
        emb = _emb(spark)
        p = str(tmp_path / "lsh")
        S.lsh_index_write(emb, "embedding", "vec_id", p, dim=64)
        S.lsh_index_append(emb.limit(3), "embedding", "vec_id", p, dim=64)
        S.lsh_index_upsert(emb.limit(5), "embedding", "vec_id", p, dim=64)
        import os

        assert not os.path.exists(f"{p}/log")  # folded, not refused


class TestIvfpqRebuildConsumesTiers:
    """The IVFADC rebuild (= the family's compaction) consumes the
    merge-on-read tiers transactionally. Previously it left them in
    place: a stale log row outranked the rebuild's fresh value in the
    max-seq fold, and an old tombstone silently killed a re-included
    key — the exact silent-wrong-answer the takedown soak could not
    see because its rebuild corpus happened to agree with the log."""

    def _fixtures(self, spark):
        emb = _emb(spark)
        cents = S.seed_centroids(emb, "embedding", "vec_id", n_clusters=4)
        cb = S.pq_seed_codebooks(
            emb, "embedding", "vec_id", n_subspaces=4, n_codes=16
        )
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 1).head()["embedding"]
        ]
        return emb, cents, cb, qv

    def _probe(self, spark, path, qv, cents, cb):
        return [
            tuple(r)
            for r in S.ivfpq_probe_topk(
                spark, path, "embedding", "vec_id", qv, cents, cb,
                k=10, nprobe=4, n_candidates=64, exclude_id=1,
            ).collect()
        ]

    def _lifecycle(self, spark, tmp_path, crash_between_swaps=False):
        """build(A) → append(B) → delete(X⊂A) → rebuild(C) where C
        re-includes X and CHANGES B's vectors — both divergence modes
        at once. Returns (rebuilt path, fresh-twin path, C)."""
        emb, cents, cb, qv = self._fixtures(spark)
        a = emb.filter(F.col("vec_id") % 3 != 0)
        b = emb.filter(F.col("vec_id") % 3 == 0)
        doomed = [
            r[0]
            for r in a.select("vec_id").orderBy("vec_id").limit(3).collect()
        ]
        # C: everything, with B's vectors NEGATED (changes every cosine
        # rank involving them) and the deleted ids re-included
        flipped = b.withColumn(
            "embedding", F.expr("transform(embedding, v -> -v)")
        )
        c = a.unionByName(flipped)

        p = str(tmp_path / "ivfpq")
        S.ivfpq_index_write(a, "embedding", "vec_id", p, cents, cb)
        S.ivfpq_index_append(b, "embedding", "vec_id", p, cents, cb)
        S.ivf_index_delete(spark, p, "vec_id", doomed)

        if crash_between_swaps:
            real_swap = S._fs_swap_dir
            calls = {"n": 0}

            def crash_second(spark_, live, staged):
                calls["n"] += 1
                if calls["n"] == 2:
                    raise RuntimeError("injected crash between swaps")
                real_swap(spark_, live, staged)

            S._fs_swap_dir = crash_second
            try:
                with pytest.raises(RuntimeError, match="injected"):
                    S.ivfpq_index_write(c, "embedding", "vec_id", p, cents, cb)
            finally:
                S._fs_swap_dir = real_swap
            import os

            assert os.path.exists(f"{p}/{S._IVFPQ_REBUILD_MARKER}")
            # in-process failure released the lease; the marker stays
            # for the roll-forward
            assert not os.path.exists(f"{p}/{S._LEASE_FILE}")
        else:
            S.ivfpq_index_write(c, "embedding", "vec_id", p, cents, cb)

        fresh = str(tmp_path / "twin")
        S.ivfpq_index_write(c, "embedding", "vec_id", fresh, cents, cb)
        return p, fresh, c, cents, cb, qv, doomed

    def test_rebuild_equals_fresh_twin(self, spark, tmp_path):
        import os

        p, fresh, c, cents, cb, qv, doomed = self._lifecycle(spark, tmp_path)
        # tiers consumed: nothing left to outrank or kill the rebuild
        for tier in ("log", "codes_log", "tombstones"):
            assert not os.path.exists(f"{p}/{tier}"), tier
        assert not os.path.exists(f"{p}/{S._IVFPQ_REBUILD_MARKER}")
        # the read view IS the rebuild corpus: re-included deleted ids
        # are back, changed vectors serve their NEW values
        view = S.ivf_index_read(spark, p)
        assert view.count() == c.count()
        assert not set(doomed) - {
            r[0] for r in view.select("vec_id").collect()
        }
        assert self._probe(spark, p, qv, cents, cb) == self._probe(
            spark, fresh, qv, cents, cb
        )

    def test_crash_between_swaps_rolls_forward(self, spark, tmp_path):
        import os

        p, fresh, c, cents, cb, qv, doomed = self._lifecycle(
            spark, tmp_path, crash_between_swaps=True
        )
        # first family entry point after the crash finishes the job:
        # remaining swap + consumed-tier drops + marker delete
        got = self._probe(spark, p, qv, cents, cb)
        assert not os.path.exists(f"{p}/{S._IVFPQ_REBUILD_MARKER}")
        for tier in ("log", "codes_log", "tombstones"):
            assert not os.path.exists(f"{p}/{tier}"), tier
        assert got == self._probe(spark, fresh, qv, cents, cb)

    def test_tier_entries_after_snapshot_survive(self, spark, tmp_path):
        """A tombstone landing between the rebuild's snapshot and its
        drops is NOT consumed — takedown-wins (the consumed-snapshot
        contract every compactor shares)."""
        emb, cents, cb, qv = self._fixtures(spark)
        p = str(tmp_path / "ivfpq")
        S.ivfpq_index_write(emb, "embedding", "vec_id", p, cents, cb)
        S.ivfpq_index_append(
            emb.limit(3), "embedding", "vec_id", p, cents, cb
        )

        real_swap = S._fs_swap_dir

        def late_tombstone_then_swap(spark_, live, staged):
            # fires inside the rebuild, after the snapshot was taken
            S._fs_swap_dir = real_swap
            S.ivf_index_delete(spark_, p, "vec_id", [2], seq=99)
            real_swap(spark_, live, staged)

        S._fs_swap_dir = late_tombstone_then_swap
        try:
            S.ivfpq_index_write(emb, "embedding", "vec_id", p, cents, cb)
        finally:
            S._fs_swap_dir = real_swap
        import os

        assert os.path.exists(f"{p}/tombstones")  # survived the drops
        view_ids = {r[0] for r in S.ivf_index_read(spark, p).select("vec_id").collect()}
        assert 2 not in view_ids


class TestLeaseHeartbeat:
    """Staleness is mtime-based, so without a refresh a LEGITIMATE
    maintenance pass outlasting the ttl (an O(corpus) compact at real
    scale) had its lease silently stolen mid-run. The heartbeat thread
    re-touches the lease every ttl/4 while the section runs."""

    def test_long_section_is_not_stolen(self, spark, tmp_path):
        import time

        p = str(tmp_path / "idx")
        with S._maintenance_lease(spark, p, "long-compact", ttl_sec=1):
            # hold well past the ttl; a racer must refuse the WHOLE time
            deadline = time.time() + 3.0
            while time.time() < deadline:
                with pytest.raises(S.MaintenanceLeaseHeld):
                    S._acquire_lease(spark, p, "racer", ttl_sec=1)
                time.sleep(0.4)
        # released: the racer acquires immediately
        S._acquire_lease(spark, p, "racer", ttl_sec=1)
        S._release_lease(spark, p)

    def test_publish_lease_heartbeat(self, tmp_path):
        import time

        from hours_api_clickup_spark.sinks.versioned import (
            PublishLeaseHeld,
            publish_lease,
        )

        p = str(tmp_path / "store")
        with publish_lease(p, "long-publish", ttl_sec=1):
            deadline = time.time() + 3.0
            while time.time() < deadline:
                with pytest.raises(PublishLeaseHeld):
                    with publish_lease(p, "racer", ttl_sec=1):
                        pass
                time.sleep(0.4)
        with publish_lease(p, "racer", ttl_sec=1):
            pass


class TestFactTableLock:
    """The fact-table read→merge→overwrite cycles (batch syncs AND the
    streaming refresh's foreachBatch) share a single-writer lease in a
    ``{path}__lock`` sibling: two of them racing one table both read
    the same old fact and the loser's merged rows were silently erased
    by the winner's swap — now the loser refuses loudly."""

    def _raw(self, spark, tmp_path, rows, name):
        import json

        from hours_api_clickup_spark.sources.readers import (
            read_raw_time_entries,
        )
        from tests.test_domain_semantics import _entry

        p = tmp_path / name
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(_entry(**r)) + "\n")
        return read_raw_time_entries(spark, str(p))

    def test_syncs_refuse_under_held_lock(self, spark, tmp_path):
        import datetime as dt

        from hours_api_clickup_spark import pipelines

        t0 = 1700000000000
        raw = self._raw(
            spark, tmp_path,
            [dict(eid="e1", start_ms=t0, at_ms=t0)], "a.json",
        )
        fact = str(tmp_path / "fact")
        today = dt.date(2023, 11, 20)
        r = pipelines.sync_refresh(spark, raw, fact, today)
        assert r.rows == 1

        S._acquire_lease(spark, f"{fact}__lock", "simulated-writer")
        try:
            with pytest.raises(S.MaintenanceLeaseHeld, match="lease"):
                pipelines.sync_refresh(spark, raw, fact, today)
            with pytest.raises(S.MaintenanceLeaseHeld, match="lease"):
                pipelines.sync_full_reindex(spark, raw, fact)
        finally:
            S._release_lease(spark, f"{fact}__lock")
        # released: both cycles run again
        assert pipelines.sync_refresh(spark, raw, fact, today).rows == 1
        assert pipelines.sync_full_reindex(spark, raw, fact).rows == 1

    def test_streaming_batch_refuses_under_held_lock(self, spark, tmp_path):
        import datetime as dt
        import json

        from hours_api_clickup_spark.streaming.refresh import (
            streaming_refresh,
        )
        from tests.test_domain_semantics import _entry

        t0 = 1700000000000
        src = tmp_path / "src"
        src.mkdir()
        with open(src / "a.json", "w") as f:
            f.write(json.dumps(_entry("e1", start_ms=t0, at_ms=t0)) + "\n")
        fact = str(tmp_path / "fact")
        S._acquire_lease(spark, f"{fact}__lock", "scheduled-refresh")
        try:
            # lock_wait_s=0: immediate loud refusal (the bounded-wait
            # default is exercised in the stall test below)
            q = streaming_refresh(
                spark, str(src), fact, str(tmp_path / "ckpt"),
                dt.date(2023, 11, 20), lock_wait_s=0,
            )
            with pytest.raises(Exception, match="[Ll]ease"):
                q.awaitTermination(300)
                if q.exception() is not None:
                    raise q.exception()
            import os

            assert not os.path.exists(fact)  # nothing half-written
        finally:
            S._release_lease(spark, f"{fact}__lock")
        # released: a fresh stream (same checkpoint) lands the batch
        q2 = streaming_refresh(
            spark, str(src), fact, str(tmp_path / "ckpt"),
            dt.date(2023, 11, 20),
        )
        q2.awaitTermination(300)
        assert spark.read.parquet(fact).count() == 1

    def test_streaming_batch_waits_out_a_short_hold(self, spark, tmp_path):
        """The common collision — a seconds-long scheduled sync holding
        the table lock — stalls the streaming batch (bounded poll)
        instead of killing the query: the batch lands once the hold
        releases."""
        import datetime as dt
        import json
        import threading

        from hours_api_clickup_spark.streaming.refresh import (
            streaming_refresh,
        )
        from tests.test_domain_semantics import _entry

        t0 = 1700000000000
        src = tmp_path / "src"
        src.mkdir()
        with open(src / "a.json", "w") as f:
            f.write(json.dumps(_entry("e1", start_ms=t0, at_ms=t0)) + "\n")
        fact = str(tmp_path / "fact")
        S._acquire_lease(spark, f"{fact}__lock", "scheduled-refresh")
        releaser = threading.Timer(
            3.0, lambda: S._release_lease(spark, f"{fact}__lock")
        )
        releaser.start()
        try:
            q = streaming_refresh(
                spark, str(src), fact, str(tmp_path / "ckpt"),
                dt.date(2023, 11, 20), lock_wait_s=60,
            )
            assert q.awaitTermination(300)
            assert q.exception() is None
        finally:
            releaser.cancel()
        assert spark.read.parquet(fact).count() == 1


class TestCompactSmallFilesSafety:
    """The generic layout compactor swaps the WHOLE directory, so —
    unlike the index compactors, whose consumed-snapshot protocol lets
    a racing append's file survive for the next compact — a file
    appended during its rewrite used to be silently erased by the
    swap. Now: snapshot-exact read + pre-swap drift check (loud abort,
    live table untouched) + maintainer lease in a sibling lock dir."""

    def test_concurrent_append_aborts_without_losing_it(
        self, spark, tmp_path
    ):
        import os

        from hours_api_clickup_spark.operators.compaction import (
            compact_small_files,
        )

        docs = _docs(spark).limit(50)
        path = str(tmp_path / "tbl")
        docs.repartition(8).write.parquet(path)

        def inject():
            docs.limit(1).write.mode("append").parquet(path)

        with pytest.raises(RuntimeError, match="changed during"):
            compact_small_files(
                spark, path, target_bytes=10**9,
                _inject_before_drift_check=inject,
            )
        # live table intact INCLUDING the racing append; staged dropped
        assert spark.read.parquet(path).count() == 51
        assert not os.path.exists(path + "__staged")
        assert not os.path.exists(f"{path}__lock/{S._LEASE_FILE}")
        # writers quiescent: the retry compacts everything
        assert compact_small_files(spark, path, target_bytes=10**9) == 1
        assert spark.read.parquet(path).count() == 51

    def test_lease_guarded(self, spark, tmp_path):
        from hours_api_clickup_spark.operators.compaction import (
            compact_small_files,
        )

        docs = _docs(spark).limit(20)
        path = str(tmp_path / "tbl")
        docs.repartition(8).write.parquet(path)
        S._acquire_lease(spark, f"{path}__lock", "simulated-maintainer")
        try:
            with pytest.raises(S.MaintenanceLeaseHeld, match="lease"):
                compact_small_files(spark, path, target_bytes=10**9)
        finally:
            S._release_lease(spark, f"{path}__lock")
        assert compact_small_files(spark, path, target_bytes=10**9) == 1


class TestLeaseFencing:
    """Claim-token fencing (VERDICT r9 #2): ownership is re-verified at
    the two moments it matters — release, and the commit-point swap —
    so a holder paused past the ttl and superseded by a taker refuses
    its swap and never deletes the successor's lease."""

    def test_paused_holder_takeover(self, spark, tmp_path):
        """The verdict's exact scenario: freeze past the ttl (no
        heartbeat — a paused process doesn't heartbeat), let a taker
        claim, resume at the commit point."""
        import os
        import time

        p = str(tmp_path / "idx")
        staged = f"{p}/base__staged"
        os.makedirs(staged)
        old_token = S._acquire_lease(spark, p, "old-holder", ttl_sec=1)
        S._held_leases()[p] = old_token
        try:
            time.sleep(1.2)  # the stall: lease goes stale by mtime
            taker_token = S._acquire_lease(spark, p, "taker", ttl_sec=1)
            # old holder resumes at its commit point: the swap re-reads
            # the lease, sees the successor's token, refuses loudly
            with pytest.raises(S.MaintenanceLeaseLost, match="successor"):
                S._fs_swap_dir(spark, f"{p}/base", staged)
            assert os.path.exists(staged)  # nothing was clobbered
            # ...and the old holder's release spares the taker's lease
            S._release_lease(spark, p, old_token)
            assert os.path.exists(f"{p}/{S._LEASE_FILE}")
            assert S._read_lease_token(spark, p) == taker_token
        finally:
            S._held_leases().pop(p, None)
            S._release_lease(spark, p)

    def test_maintenance_section_fences_its_swap(self, spark, tmp_path):
        """End-to-end through the contextmanager: a takeover mid-section
        makes the section's own swap refuse, and exit leaves the
        successor's lease intact."""
        import os

        p = str(tmp_path / "idx")
        staged = f"{p}/base__staged"
        os.makedirs(staged)
        with S._maintenance_lease(spark, p, "old-holder"):
            # simulate a successful takeover after a stall the way a
            # real taker does it: delete the stale lease + re-claim
            # (a Python-side file rewrite would desync Hadoop's local
            # .crc sidecar and read as unreadable, which also refuses —
            # but the assertion below wants the successor's token)
            S._fs_delete(spark, f"{p}/{S._LEASE_FILE}")
            succ_token = S._acquire_lease(spark, p, "taker")
            with pytest.raises(S.MaintenanceLeaseLost, match="successor"):
                S._fs_swap_dir(spark, f"{p}/base", staged)
        # the finally-release saw a foreign token and left it alone
        assert S._read_lease_token(spark, p) == succ_token
        S._release_lease(spark, p)  # cleanup

    def test_matching_token_swaps_normally(self, spark, tmp_path):
        import os

        p = str(tmp_path / "idx")
        staged = f"{p}/base__staged"
        os.makedirs(staged)
        with open(f"{staged}/data.txt", "w") as f:
            f.write("x")
        with S._maintenance_lease(spark, p, "holder"):
            S._fs_swap_dir(spark, f"{p}/base", staged)
        assert os.path.exists(f"{p}/base/data.txt")
        assert not os.path.exists(f"{p}/{S._LEASE_FILE}")  # released

    def test_publish_lease_takeover(self, tmp_path):
        """The versioned store's twin: pointer/manifest swaps re-verify
        the claim token, and release spares the successor's lease."""
        import os

        import hours_api_clickup_spark.sinks.versioned as V

        p = str(tmp_path / "store")
        with V.publish_lease(p, "old-holder"):
            with open(os.path.join(p, V._LEASE), "w") as f:
                f.write("taker host=elsewhere pid=1 t=0 token=succtok")
            with pytest.raises(V.PublishLeaseLost, match="successor"):
                V.publish_manifest(p, {"2024-01": 0})
            assert not os.path.exists(os.path.join(p, V._MANIFEST))
        assert V._lease_token_on_disk(p) == "succtok"  # spared
        os.unlink(os.path.join(p, V._LEASE))
        # unfenced again: the same publish goes through
        V.publish_manifest(p, {"2024-01": 0})
        assert V.read_manifest(p) == {"2024-01": 0}

    def test_unleased_callers_are_not_fenced(self, spark, tmp_path):
        """The lease is opt-in: a bare _fs_swap_dir with no held lease
        (recovery roll-forwards run this way pre-claim) still works."""
        import os

        p = str(tmp_path / "idx")
        staged = f"{p}/base__staged"
        os.makedirs(staged)
        S._fs_swap_dir(spark, f"{p}/base", staged)
        assert os.path.exists(f"{p}/base")


class TestRecoveryIsLeased:
    """Recovery roll-forward is maintenance (ADVICE r9 high): the
    rebuild commit marker exists during every LIVE rebuild's commit
    window, so an unleased probe must not roll it forward concurrently
    with the holder's own commit sequence. Recovery defers to a live
    lease and claims it otherwise."""

    def test_ivfpq_recover_defers_to_live_maintainer(self, spark, tmp_path):
        import os

        p = str(tmp_path / "ivfpq")
        os.makedirs(p)
        marker = f"{p}/{S._IVFPQ_REBUILD_MARKER}"
        S._fs_write_file_atomic(spark, marker, "{}")
        S._acquire_lease(spark, p, "live-maintainer")  # our pid: live
        try:
            S._ivfpq_recover(spark, p)  # skips: the holder owns this
            assert os.path.exists(marker)
        finally:
            S._release_lease(spark, p)
        S._ivfpq_recover(spark, p)  # no lease: claims, rolls forward
        assert not os.path.exists(marker)
        assert not os.path.exists(f"{p}/{S._LEASE_FILE}")  # released

    def test_doc_index_recover_defers_to_live_maintainer(
        self, spark, tmp_path
    ):
        import os

        import hours_api_clickup_spark.datapipe.dedup as D

        p = str(tmp_path / "neardup")
        os.makedirs(p)
        marker = f"{p}/{D._REBUILD_MARKER}"
        S._fs_touch(spark, marker)
        S._acquire_lease(spark, p, "live-maintainer")
        try:
            D._doc_index_recover(spark, p)
            assert os.path.exists(marker)
        finally:
            S._release_lease(spark, p)
        D._doc_index_recover(spark, p)
        assert not os.path.exists(marker)
        assert not os.path.exists(f"{p}/{S._LEASE_FILE}")


class TestRecoveryVerdictCache:
    """VERDICT r10 #3: after one full clean probe, the session caches
    the 'no recovery pending' verdict per (SparkSession, path) — one
    exists() round per session per clean index — and any lease claim
    on the path voids it so the full check re-runs after maintenance."""

    def _count_exists(self, monkeypatch):
        calls = {"n": 0}
        real = S._fs_exists

        def counting(spark, p):
            calls["n"] += 1
            return real(spark, p)

        monkeypatch.setattr(S, "_fs_exists", counting)
        return calls

    def test_clean_verdict_cached_then_voided_by_lease(
        self, spark, tmp_path, monkeypatch
    ):
        import os

        p = str(tmp_path / "ivfpq")
        os.makedirs(p)
        calls = self._count_exists(monkeypatch)
        S._ivfpq_recover(spark, p)  # full probe, proves clean
        first = calls["n"]
        assert first >= 3
        S._ivfpq_recover(spark, p)  # cached: zero fs rounds
        assert calls["n"] == first
        # a lease claim (any maintenance) voids the verdict
        S._release_lease(spark, p, S._acquire_lease(spark, p, "compact"))
        S._ivfpq_recover(spark, p)
        assert calls["n"] > first

    def test_pending_recovery_is_never_cached(self, spark, tmp_path):
        import os

        p = str(tmp_path / "ivfpq")
        os.makedirs(p)
        marker = f"{p}/{S._IVFPQ_REBUILD_MARKER}"
        S._fs_write_file_atomic(spark, marker, "{}")
        S._ivfpq_recover(spark, p)  # claims, rolls forward
        assert not os.path.exists(marker)
        # the roll-forward's own lease claim voided any verdict; a new
        # marker (fresh crash) must be seen by the next probe
        S._fs_write_file_atomic(spark, marker, "{}")
        S._ivfpq_recover(spark, p)
        assert not os.path.exists(marker)

    def test_doc_index_verdict_cached(self, spark, tmp_path, monkeypatch):
        import os

        import hours_api_clickup_spark.datapipe.dedup as D

        p = str(tmp_path / "neardup")
        os.makedirs(p)
        calls = self._count_exists(monkeypatch)
        D._doc_index_recover(spark, p)
        first = calls["n"]
        assert first >= 3
        D._doc_index_recover(spark, p)
        assert calls["n"] == first

    def test_ivfpq_probe_self_heals_past_cached_verdict(
        self, spark, tmp_path
    ):
        """ADVICE r11 (medium): the self-heal wrap must cover the BASE
        tier too, not only codes — a foreign maintainer's mid-swap
        crash on base after this session cached 'clean' must not leave
        every probe throwing persistent path-not-found."""
        import os

        emb = _emb(spark)
        cents = S.seed_centroids(emb, "embedding", "vec_id", n_clusters=4)
        cb = S.pq_seed_codebooks(
            emb, "embedding", "vec_id", n_subspaces=4, n_codes=16
        )
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 1).head()["embedding"]
        ]
        p = str(tmp_path / "ivfpq")
        S.ivfpq_index_write(emb, "embedding", "vec_id", p, cents, cb)

        def probe():
            return [
                tuple(r)
                for r in S.ivfpq_probe_topk(
                    spark, p, "embedding", "vec_id", qv, cents, cb,
                    k=5, nprobe=4, exclude_id=1,
                ).collect()
            ]

        want = probe()  # proves clean and caches the verdict
        assert S._recovery_verdict_cached(spark, p)
        os.rename(f"{p}/base", f"{p}/base__old")  # foreign crash
        assert probe() == want  # self-heals: read fails → recover → retry
        assert os.path.isdir(f"{p}/base")
        assert not os.path.exists(f"{p}/base__old")

    def test_mark_clean_refused_after_concurrent_invalidation(
        self, spark, tmp_path
    ):
        """ADVICE r11 (low, TOCTOU): a lease claim landing BETWEEN a
        thread's clean exists() probes and its mark_clean must void
        that mark — the generation snapshot taken before the probes
        refuses a stale 'clean' verdict."""
        import os

        p = str(tmp_path / "ivfpq")
        os.makedirs(p)
        gen = S._recovery_gen(p)
        # simulate: another thread claims (and releases) the lease
        # while this thread is mid-probe
        S._release_lease(spark, p, S._acquire_lease(spark, p, "compact"))
        S._recovery_mark_clean(spark, p, gen)  # stale gen: refused
        assert not S._recovery_verdict_cached(spark, p)
        # with the CURRENT gen the mark lands
        S._recovery_mark_clean(spark, p, S._recovery_gen(p))
        assert S._recovery_verdict_cached(spark, p)

    def test_doc_probe_self_heals_past_cached_verdict(self, spark, tmp_path):
        """The cache's foreign-crash trade (review r11): a probe that
        cached 'clean' must still SELF-HEAL when a foreign maintainer's
        mid-swap crash lands afterwards — the live-tier read failure
        voids the verdict and recovers, it never becomes a persistent
        path-not-found."""
        import os

        from pyspark.sql import functions as F

        from hours_api_clickup_spark.datapipe.dedup import (
            doc_neardup_index_pairs_for_ids,
            doc_neardup_index_write,
        )
        from hours_api_clickup_spark.plans.registry import load_table
        from tests.conftest import SF_DIR

        docs = load_table(spark, SF_DIR, "documents").limit(200)
        path = str(tmp_path / "didx")
        doc_neardup_index_write(docs, "doc_id", "text", path)
        ids = docs.select(F.col("doc_id").alias("did")).limit(20)
        want = {
            (r.id_a, r.id_b)
            for r in doc_neardup_index_pairs_for_ids(spark, path, ids).collect()
        }  # this probe proved clean and CACHED the verdict
        assert S._recovery_verdict_cached(spark, path)
        os.rename(f"{path}/sig", f"{path}/sig__old")  # foreign crash
        got = {
            (r.id_a, r.id_b)
            for r in doc_neardup_index_pairs_for_ids(spark, path, ids).collect()
        }
        assert got == want
        assert os.path.isdir(f"{path}/sig")
        assert not os.path.exists(f"{path}/sig__old")


class TestAppendBootstrapLeased:
    """The append APIs' bootstrap rebuild takes the maintenance lease
    for bare (non-streaming) callers (ADVICE r9): two racing
    first-batch writers must not rebuild both tiers unprotected."""

    def _refuses_bootstrap(self, spark, path, op):
        S._acquire_lease(spark, path, "simulated-maintainer")
        try:
            with pytest.raises(S.MaintenanceLeaseHeld, match="lease"):
                op()
        finally:
            S._release_lease(spark, path)
        op()  # released: the same bootstrap goes through

    def test_lsh_append_bootstrap(self, spark, tmp_path):
        emb = _emb(spark).limit(8)
        p = str(tmp_path / "lsh")
        self._refuses_bootstrap(
            spark, p,
            lambda: S.lsh_index_append(
                emb, "embedding", "vec_id", p, dim=64
            ),
        )

    def test_ivf_append_bootstrap(self, spark, tmp_path):
        emb = _emb(spark).limit(8)
        cents = S.seed_centroids(emb, "embedding", "vec_id", n_clusters=2)
        p = str(tmp_path / "ivf")
        self._refuses_bootstrap(
            spark, p,
            lambda: S.ivf_index_append(emb, "embedding", "vec_id", p, cents),
        )

    def test_ivfpq_append_bootstrap(self, spark, tmp_path):
        emb = _emb(spark).limit(8)
        cents = S.seed_centroids(emb, "embedding", "vec_id", n_clusters=2)
        cb = S.pq_seed_codebooks(
            emb, "embedding", "vec_id", n_subspaces=4, n_codes=4
        )
        p = str(tmp_path / "ivfpq")
        self._refuses_bootstrap(
            spark, p,
            lambda: S.ivfpq_index_append(
                emb, "embedding", "vec_id", p, cents, cb
            ),
        )

    def test_text_append_bootstrap(self, spark, tmp_path):
        from hours_api_clickup_spark.datapipe.textindex import (
            inverted_index_append,
        )

        docs = _docs(spark).limit(8)
        p = str(tmp_path / "text")
        self._refuses_bootstrap(
            spark, p,
            lambda: inverted_index_append(docs, "text", "doc_id", p),
        )
