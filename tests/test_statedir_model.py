"""Model-based check of the statedir invariant: against a driver-side
model (a dict of committed batches), a RANDOM interleaving of batch
commits, compactions, torn compactions, and interrupted deletes must
never change what any executing batch observes.

This generalizes test_statedir.py's hand-picked interleavings: hypothesis
drives the schedule (including the leveled tier's minor delta folds and
torn delta publishes), the model is the obviously-correct union, and the
assertion is read_state == model at every step for both the next batch id
and the accessor horizon (1 << 62)."""

from __future__ import annotations

import os
import shutil

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stream_cdc_spark.streaming import statedir

SCHEMA = "id bigint, v bigint"

# ops: ("commit",) advances the stream one batch; ("compact",) folds at
# the current head; ("torn_compact",) fakes a crash mid-publish (dir
# without _SUCCESS); ("interrupted_delete",) publishes by hand but leaves
# the folded dirs in place.
OPS = st.lists(
    st.sampled_from(
        [
            "commit",
            "compact",
            "minor_compact",
            "torn_compact",
            "torn_delta",
            "interrupted_delete",
        ]
    ),
    min_size=4,
    max_size=10,
)


@pytest.fixture(scope="module")
def sd_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("statedir-model"))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=OPS)
@pytest.mark.slow
def test_random_interleavings_preserve_reads(spark, sd_root, ops):
    root = os.path.join(sd_root, "-".join(o[0] for o in ops))
    shutil.rmtree(root, ignore_errors=True)
    model: dict[int, list[tuple[int, int]]] = {}
    head = 0  # next batch id the stream would execute

    def observed(batch_id):
        return sorted(
            map(tuple, statedir.read_state(spark, root, SCHEMA, batch_id).collect())
        )

    def expected(batch_id):
        return sorted(r for b, rows in model.items() if b < batch_id for r in rows)

    for op in ops:
        if op == "commit":
            rows = [(head * 10 + j, head) for j in range(2)]
            spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(
                statedir.batch_dir(root, head)
            )
            model[head] = rows
            head += 1
        elif op == "compact":
            statedir.compact(spark, root, SCHEMA, head)
        elif op == "minor_compact":
            statedir.compact_minor(spark, root, SCHEMA, head)
        elif op == "torn_delta":
            torn = os.path.join(root, f"delta=000000000-{head:09d}")
            if not os.path.exists(torn):
                os.makedirs(torn)
                with open(os.path.join(torn, "part-0.parquet"), "wb") as f:
                    f.write(b"\x00torn")
        elif op == "torn_compact":
            torn = os.path.join(root, f"compact={head:09d}")
            if not os.path.exists(torn):
                os.makedirs(torn)
                with open(os.path.join(torn, "part-0.parquet"), "wb") as f:
                    f.write(b"\x00torn")
        elif op == "interrupted_delete":
            # hand-publish a valid snapshot at the head with the manifest
            # protocol but skip the deletes — the writer crashed between
            # the manifest put and the cleanup. Skipped when a publish at
            # this watermark is already valid (the protocol is
            # single-writer: a re-publish of a committed watermark is the
            # replay no-op, never a blind overwrite of a live manifest).
            dest = os.path.join(root, f"compact={head:09d}")
            fsd = statedir._DEFAULT_FS
            if statedir.state_paths(root, head) and not statedir._is_valid(
                fsd, dest
            ):
                df = statedir.read_state(spark, root, SCHEMA, head)
                df.write.mode("overwrite").parquet(dest)
                statedir._publish_manifest(fsd, dest)
        # the two reads every consumer performs: the executing batch
        # (exactly-once replay view) and the accessor horizon
        assert observed(head) == expected(head), (op, head)
        assert observed(1 << 62) == expected(1 << 62), (op, head)


# -- object-store (S3-semantics) model -------------------------------------


class InjectedCrash(Exception):
    pass


class ObjectStoreFS(statedir.LocalFS):
    """S3-semantics fake for the round-7 manifest protocol:

    * directory rename DOES NOT EXIST (on S3 it is copy-then-delete and
      can expose a partially-copied dir complete with _SUCCESS — the
      exact hazard the manifest commit removes). The protocol must never
      ask for one; there is no rename to override because LocalFS
      deliberately has none, and the source pin below keeps os.rename
      out of the module.
    * every metadata MUTATION (single-object put / delete; recursive
      deletes decompose into per-object deletes exactly as on S3) is a
      crash point: after ``crash_after`` surviving mutations the fake
      raises, leaving whatever partial prefix of object ops completed.
    * reads (list/exists) never crash — they model GET/LIST calls whose
      failure would just retry.
    """

    def __init__(self):
        self.ops = 0
        self.crash_after: int | None = None

    def _tick(self):
        if self.crash_after is not None:
            if self.ops >= self.crash_after:
                raise InjectedCrash()
            self.ops += 1

    def put_text(self, path, text):
        self._tick()
        with open(path, "w") as f:  # atomic whole-object PUT
            f.write(text)

    def remove(self, path):
        self._tick()
        super().remove(path)

    def rmtree(self, path):
        # per-object deletes, a crash point between each — a torn
        # recursive delete leaves an arbitrary subset of the dir
        for dirpath, _dirnames, filenames in os.walk(path, topdown=False):
            for fn in filenames:
                self._tick()
                os.remove(os.path.join(dirpath, fn))
        shutil.rmtree(path, ignore_errors=True)  # empty husks: free on S3


def test_manifest_protocol_never_renames_directories():
    """The commit point must be a single-object put; any dir rename
    reintroduces the S3 torn-copy hazard the manifest protocol exists to
    remove."""
    import inspect

    src = inspect.getsource(statedir)
    assert "os.rename(" not in src
    assert "os.renames(" not in src
    # the one os.replace is the single-FILE manifest put inside LocalFS
    assert src.count("os.replace(") == 1


def test_object_store_crash_sweep(spark, tmp_path):
    """Drive the leveled protocol on the S3 fake, crashing every fold at
    every metadata-mutation boundary (each crashed attempt leaves its
    partial object writes in place — the next attempt starts from that
    wreckage). After every crash AND after convergence, both consumer
    reads must equal the model; folds must eventually complete."""
    fs = ObjectStoreFS()
    root = str(tmp_path / "s3root")
    os.makedirs(root)
    model: dict[int, list[tuple[int, int]]] = {}
    head = 0

    def observed(batch_id):
        return sorted(
            map(
                tuple,
                statedir.read_state(
                    spark, root, SCHEMA, batch_id, fs=fs
                ).collect(),
            )
        )

    def expected(batch_id):
        return sorted(r for b, rows in model.items() if b < batch_id for r in rows)

    def commit():
        nonlocal head
        rows = [(head * 10 + j, head) for j in range(2)]
        spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(
            statedir.batch_dir(root, head)
        )
        model[head] = rows
        head += 1

    def crash_sweep(fn):
        for k in range(200):
            fs.ops = 0
            fs.crash_after = k
            try:
                fn()
                fs.crash_after = None
                assert observed(head) == expected(head), ("done", k)
                assert observed(1 << 62) == expected(1 << 62), ("done", k)
                return k
            except InjectedCrash:
                fs.crash_after = None
                assert observed(head) == expected(head), ("crash", k)
                assert observed(1 << 62) == expected(1 << 62), ("crash", k)
        raise AssertionError("fold never completed within 200 mutations")

    for _ in range(3):
        commit()
    crash_sweep(lambda: statedir.compact(spark, root, SCHEMA, head, fs=fs))
    for _ in range(2):
        commit()
    crash_sweep(
        lambda: statedir.compact_minor(spark, root, SCHEMA, head, fs=fs)
    )
    for _ in range(2):
        commit()
    # major fold over snapshot + delta + pending batches
    crash_sweep(lambda: statedir.compact(spark, root, SCHEMA, head, fs=fs))
    # converged layout: exactly one snapshot expressing all state
    c = statedir.dir_counts(root, fs=fs)
    assert c["compact"] == 1 and c["delta"] == 0 and c["batch"] == 0
    assert observed(1 << 62) == expected(1 << 62)


def test_heal_completes_publish_without_refolding(spark, tmp_path):
    """Crash exactly between the snapshot data write (+_SUCCESS) and the
    manifest put: the dir is complete; the next attempt's heal step
    commits it by writing the manifest instead of deleting it as torn."""
    fs = ObjectStoreFS()
    root = str(tmp_path / "heal")
    os.makedirs(root)
    for b in range(3):
        spark.createDataFrame(
            [(b, b)], SCHEMA
        ).write.mode("overwrite").parquet(statedir.batch_dir(root, b))
    fs.ops = 0
    fs.crash_after = 1  # survive touch(_SUCCESS-if-missing)? data write
    # run until the manifest put is the op that crashes: find the crash
    # point where the dest dir exists with _SUCCESS but no manifest
    dest = os.path.join(root, "compact=000000003")
    for k in range(50):
        fs.ops = 0
        fs.crash_after = k
        try:
            statedir.compact(spark, root, SCHEMA, 3, fs=fs)
            break
        except InjectedCrash:
            pass
        finally:
            fs.crash_after = None
        if os.path.exists(os.path.join(dest, "_SUCCESS")) and not os.path.exists(
            dest + ".commit"
        ):
            # the torn-between state: heal must commit, not delete
            statedir.compact(spark, root, SCHEMA, 3, fs=fs)
            break
    assert os.path.exists(dest + ".commit")
    got = sorted(
        map(
            tuple,
            statedir.read_state(spark, root, SCHEMA, 3, fs=fs).collect(),
        )
    )
    assert got == [(0, 0), (1, 1), (2, 2)]


OPS_S3 = st.lists(
    st.one_of(
        st.just(("commit", None)),
        st.tuples(st.just("compact"), st.one_of(st.none(), st.integers(0, 12))),
        st.tuples(st.just("minor"), st.one_of(st.none(), st.integers(0, 12))),
    ),
    min_size=4,
    max_size=10,
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=OPS_S3)
@pytest.mark.slow
def test_random_interleavings_on_object_store_fake(spark, sd_root, ops):
    """The hypothesis twin of the systematic crash sweep: RANDOM
    schedules of commits and (possibly crashing, at a random metadata
    mutation) major/minor folds on the S3-semantics fake — every crashed
    attempt's partial object writes stay as the next op's starting state,
    and both consumer reads must equal the model after every op."""
    fs = ObjectStoreFS()
    tag = "-".join(f"{o[0][:2]}{'' if o[1] is None else o[1]}" for o in ops)
    root = os.path.join(sd_root, "s3rand-" + tag)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    model: dict[int, list[tuple[int, int]]] = {}
    head = 0

    def observed(batch_id):
        return sorted(
            map(
                tuple,
                statedir.read_state(
                    spark, root, SCHEMA, batch_id, fs=fs
                ).collect(),
            )
        )

    def expected(batch_id):
        return sorted(r for b, rows in model.items() if b < batch_id for r in rows)

    for op, crash_after in ops:
        if op == "commit":
            rows = [(head * 10 + j, head) for j in range(2)]
            spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(
                statedir.batch_dir(root, head)
            )
            model[head] = rows
            head += 1
        else:
            fs.ops = 0
            fs.crash_after = crash_after
            try:
                if op == "compact":
                    statedir.compact(spark, root, SCHEMA, head, fs=fs)
                else:
                    statedir.compact_minor(spark, root, SCHEMA, head, fs=fs)
            except InjectedCrash:
                pass
            finally:
                fs.crash_after = None
        assert observed(head) == expected(head), (op, crash_after, head)
        assert observed(1 << 62) == expected(1 << 62), (op, crash_after, head)


def test_strict_fs_refuses_success_only_dirs(spark, tmp_path):
    """Object-store torn copy-then-delete hazard: a ``compact=`` dir can
    surface with data files AND ``_SUCCESS`` but no manifest (e.g. a
    partially-copied legacy dir — the exact shape a pre-r7 rename could
    expose on S3). A strict fs asserts the deployment has no legacy
    history, so such a dir must be (a) invisible to reads, (b) refused by
    the heal step and deleted, never manifest-stamped."""
    fs = ObjectStoreFS()
    fs.strict = True
    root = str(tmp_path / "strict")
    os.makedirs(root)
    for b in range(2):
        spark.createDataFrame([(b, b)], SCHEMA).write.mode(
            "overwrite"
        ).parquet(statedir.batch_dir(root, b))
    # fabricate the torn-copy shape: real data files + _SUCCESS, no
    # manifest — under the legacy tier this would be accepted and healed
    fake = os.path.join(root, "compact=000000009")
    spark.createDataFrame([(999, 999)], SCHEMA).write.mode(
        "overwrite"
    ).parquet(fake)
    assert os.path.exists(os.path.join(fake, "_SUCCESS"))
    assert not os.path.exists(fake + ".commit")

    # (a) never read: the fake snapshot must not shadow the batch dirs
    got = sorted(
        map(
            tuple,
            statedir.read_state(spark, root, SCHEMA, 1 << 62, fs=fs).collect(),
        )
    )
    assert got == [(0, 0), (1, 1)]
    # (b) the next fold's reconcile deletes it instead of healing it
    assert statedir.compact(spark, root, SCHEMA, 2, fs=fs)
    assert not os.path.exists(fake)
    assert not os.path.exists(fake + ".commit")
    got = sorted(
        map(
            tuple,
            statedir.read_state(spark, root, SCHEMA, 1 << 62, fs=fs).collect(),
        )
    )
    assert got == [(0, 0), (1, 1)]
    # sanity: the same shape under a non-strict fs IS the legacy tier
    # (healed, readable) — strictness is what changed the outcome
    fs2 = ObjectStoreFS()
    root2 = str(tmp_path / "legacy")
    os.makedirs(root2)
    fake2 = os.path.join(root2, "compact=000000009")
    spark.createDataFrame([(999, 999)], SCHEMA).write.mode(
        "overwrite"
    ).parquet(fake2)
    got2 = sorted(
        map(
            tuple,
            statedir.read_state(
                spark, root2, SCHEMA, 1 << 62, fs=fs2
            ).collect(),
        )
    )
    assert got2 == [(999, 999)]


def test_heal_refuses_data_less_legacy_dir(spark, tmp_path):
    """A legacy dir whose interrupted rmtree left _SUCCESS but deleted
    every data file must be treated as torn (deleted), not healed into a
    manifested empty snapshot — stamping it would launder an incomplete
    delete into a committed (empty) publish."""
    fs = ObjectStoreFS()
    root = str(tmp_path / "dataless")
    os.makedirs(root)
    spark.createDataFrame([(0, 0)], SCHEMA).write.mode("overwrite").parquet(
        statedir.batch_dir(root, 0)
    )
    husk = os.path.join(root, "compact=000000007")
    os.makedirs(husk)
    with open(os.path.join(husk, "_SUCCESS"), "w"):
        pass  # mid-rmtree remainder: marker survived, data did not
    assert statedir.compact(spark, root, SCHEMA, 1, fs=fs)
    assert not os.path.exists(husk), "data-less legacy dir must be torn"
    got = sorted(
        map(
            tuple,
            statedir.read_state(spark, root, SCHEMA, 1 << 62, fs=fs).collect(),
        )
    )
    assert got == [(0, 0)]


def test_object_store_crash_sweep_bucketed(spark, tmp_path):
    """The round-8 bucketed tier (pre-bucketed L1 deltas, per-bucket
    major folds) must satisfy the SAME crash-point invariant as the
    plain protocol: sweep every metadata-mutation boundary of a bucketed
    minor fold and a bucketed major fold (which now reads the delta as a
    forced bucketed scan) — reads equal the model at every crash point,
    folds eventually complete, layout converges."""
    fs = ObjectStoreFS()
    root = str(tmp_path / "s3bucketed")
    os.makedirs(root)
    model: dict[int, list[tuple[int, int]]] = {}
    head = 0
    BK = dict(bucket_cols=["id"], num_buckets=2)

    def observed(batch_id):
        return sorted(
            map(
                tuple,
                statedir.read_state(
                    spark, root, SCHEMA, batch_id, fs=fs
                ).collect(),
            )
        )

    def expected(batch_id):
        return sorted(r for b, rows in model.items() if b < batch_id for r in rows)

    def commit():
        nonlocal head
        rows = [(head * 10 + j, head) for j in range(2)]
        spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(
            statedir.batch_dir(root, head)
        )
        model[head] = rows
        head += 1

    def crash_sweep(fn):
        for k in range(200):
            fs.ops = 0
            fs.crash_after = k
            try:
                fn()
                fs.crash_after = None
                assert observed(head) == expected(head), ("done", k)
                assert observed(1 << 62) == expected(1 << 62), ("done", k)
                return k
            except InjectedCrash:
                fs.crash_after = None
                assert observed(head) == expected(head), ("crash", k)
                assert observed(1 << 62) == expected(1 << 62), ("crash", k)
        raise AssertionError("fold never completed within 200 mutations")

    for _ in range(2):
        commit()
    crash_sweep(
        lambda: statedir.compact_minor(spark, root, SCHEMA, head, fs=fs, **BK)
    )
    for _ in range(2):
        commit()
    # bucketed major fold over bucketed delta + pending batches
    crash_sweep(
        lambda: statedir.compact(spark, root, SCHEMA, head, fs=fs, **BK)
    )
    c = statedir.dir_counts(root, fs=fs)
    assert c["compact"] == 1 and c["delta"] == 0 and c["batch"] == 0
    assert observed(1 << 62) == expected(1 << 62)


def test_heal_preserves_data_less_chain_anchor(spark, tmp_path):
    """ADVICE r9: a legitimately-EMPTY legacy compact cover (pre-r7
    empty-state snapshot that wrote no part files) with a valid delta
    stacked on it (delta lo == the cover's watermark) must be HEALED
    with an empty-file manifest, not deleted — deleting the chain
    anchor would orphan the delta and silently hide its rows."""
    root = str(tmp_path / "anchor")
    os.makedirs(root)
    # the data-less legacy anchor: _SUCCESS only, no data, no manifest
    anchor = os.path.join(root, "compact=000000005")
    os.makedirs(anchor)
    with open(os.path.join(anchor, "_SUCCESS"), "w"):
        pass
    # a valid delta stacked on it, holding the rows of batches [5, 7)
    delta = os.path.join(root, "delta=000000005-000000007")
    spark.createDataFrame([(5, 50), (6, 60)], SCHEMA).write.mode(
        "overwrite"
    ).parquet(delta)
    statedir._publish_manifest(statedir._DEFAULT_FS, delta)
    # one batch above the chain
    spark.createDataFrame([(7, 70)], SCHEMA).write.mode(
        "overwrite"
    ).parquet(statedir.batch_dir(root, 7))

    want = [(5, 50), (6, 60), (7, 70)]
    got_before = sorted(
        map(tuple, statedir.read_state(spark, root, SCHEMA, 8).collect())
    )
    assert got_before == want
    # the fold triggers _reconcile; the anchor must survive (healed)
    assert statedir.compact(spark, root, SCHEMA, 8)
    got_after = sorted(
        map(
            tuple,
            statedir.read_state(spark, root, SCHEMA, 1 << 62).collect(),
        )
    )
    assert got_after == want, "chain anchor was orphaned, delta rows lost"


def test_heal_recovers_bucket_spec_from_intent(spark, tmp_path):
    """ADVICE r8 / code-review r9: a bucketed publish that crashed
    between saveAsTable and the manifest put must be healed WITH the
    spec from the writer's INTENT marker — the truth of the files on
    disk — even when the restarted deployment's constants have DRIFTED
    (intent n=4, restart folds with n=8: the healed manifest must say
    4, or the per-bucket fold would skip an exchange the files don't
    satisfy)."""
    import json as _json

    root = str(tmp_path / "bspec")
    os.makedirs(root)
    for b in range(3):
        spark.createDataFrame([(b, b * 10)], SCHEMA).write.mode(
            "overwrite"
        ).parquet(statedir.batch_dir(root, b))
    assert statedir.compact_minor(
        spark, root, SCHEMA, 3, bucket_cols=["id"], num_buckets=4
    )
    delta = os.path.join(root, "delta=000000000-000000003")
    mp = statedir._manifest_path(delta)
    assert _json.loads(open(mp).read())["bucket"] == {"cols": ["id"], "n": 4}
    # a completed publish removed its intent marker
    assert not os.path.exists(statedir._intent_path(delta))
    # simulate the real crash point: intent + data + _SUCCESS, no
    # manifest (the state between saveAsTable and the manifest put)
    os.remove(mp)
    statedir._put_bucket_intent(statedir._DEFAULT_FS, delta, ["id"], 4)
    # the restarted deployment folds with DIFFERENT constants (n=8)
    spark.createDataFrame([(9, 90)], SCHEMA).write.mode(
        "overwrite"
    ).parquet(statedir.batch_dir(root, 9))
    assert statedir.compact_minor(
        spark, root, SCHEMA, 10, bucket_cols=["id"], num_buckets=8
    )
    healed = _json.loads(open(mp).read())
    assert healed["bucket"] == {"cols": ["id"], "n": 4}  # intent, not hint
    assert not os.path.exists(statedir._intent_path(delta))  # consumed
    got = sorted(
        map(
            tuple,
            statedir.read_state(spark, root, SCHEMA, 1 << 62).collect(),
        )
    )
    assert got == [(0, 0), (1, 10), (2, 20), (9, 90)]


def test_heal_does_not_mislabel_plain_dir_as_bucketed(spark, tmp_path):
    """The bucket hint is accepted only when the file names prove the
    bucketed layout: healing a PLAIN-parquet dir under a bucket hint
    must stamp a plain manifest (no bucket key)."""
    root = str(tmp_path / "plainheal")
    os.makedirs(root)
    plain = os.path.join(root, "delta=000000000-000000002")
    spark.createDataFrame([(1, 10)], SCHEMA).write.mode(
        "overwrite"
    ).parquet(plain)  # plain write: _SUCCESS, no manifest, no bucket ids
    spark.createDataFrame([(2, 20)], SCHEMA).write.mode(
        "overwrite"
    ).parquet(statedir.batch_dir(root, 2))
    # even a (bogus/stale) intent cannot mislabel it: the file names
    # carry no bucket-id suffix, so the heal stamps a plain manifest
    statedir._put_bucket_intent(statedir._DEFAULT_FS, plain, ["id"], 4)
    statedir._reconcile(root, statedir._DEFAULT_FS)
    import json as _json

    info = _json.loads(open(statedir._manifest_path(plain)).read())
    assert "bucket" not in info
    got = sorted(
        map(
            tuple,
            statedir.read_state(spark, root, SCHEMA, 1 << 62).collect(),
        )
    )
    assert got == [(1, 10), (2, 20)]
