"""Parity pin for the transformWithState (Spark 4 StatefulProcessor)
heavy-hitter variant: same exactly-once promotion semantics as the
applyInPandasWithState implementation, running under the RocksDB
state store provider the new API requires.

The full streaming run needs `google.protobuf` (the state-server wire
protocol of pyspark.sql.streaming.stateful_processor_api_client); the
sandbox image ships Spark 4 without it, so the end-to-end pin is
skipped there and the processor's promotion logic is unit-pinned
directly instead (same state transitions, no wire protocol)."""

import importlib.util
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_intern_spark.streaming.extract_stream import (
    HH_TOKENS_DDL,
    stream_heavy_hitters_tws,
)

try:
    _HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:  # no `google` namespace package at all
    _HAS_PROTOBUF = False

_SCHEMA = pa.schema([("tok", pa.string())])


def _write(path, toks):
    pq.write_table(pa.table({"tok": list(toks)}, schema=_SCHEMA), path)


@pytest.fixture()
def tok_stream_dir(tmp_path):
    d = tmp_path / "toks"
    d.mkdir()
    # hot: 3 + 2 + 2 = 7 (crosses 5 in batch 2); warm: 1+1 = 2; cold: 1
    _write(str(d / "batch1.parquet"), ["hot"] * 3 + ["warm"])
    _write(str(d / "batch2.parquet"), ["hot"] * 2 + ["warm", "cold"])
    _write(str(d / "batch3.parquet"), ["hot"] * 2)
    return str(d)


_PBSHIM_VENDORED = "/usr/lib/google-cloud-sdk/platform/google_appengine"
_HAS_PBSHIM = os.path.isdir(
    os.path.join(_PBSHIM_VENDORED, "google", "protobuf")
)

_SHIM_JOB = """
import os, sys, time, json
import pyarrow as pa, pyarrow.parquet as pq
from pyspark.sql import SparkSession
from ocr_intern_spark.streaming.extract_stream import (
    HH_TOKENS_DDL, stream_heavy_hitters_tws)

d = sys.argv[1]
schema = pa.schema([("tok", pa.string())])

def write(name, toks):
    # atomic: never expose a half-written footer to the file source
    tmp = os.path.join(d, "..", name + ".tmp")
    pq.write_table(pa.table({"tok": list(toks)}, schema=schema), tmp)
    os.rename(tmp, os.path.join(d, name))

def poll(fn, deadline_s=240):
    deadline = time.time() + deadline_s
    while time.time() < deadline:
        v = fn()
        if v is not None:
            return v
        time.sleep(1)
    raise TimeoutError("stream poll deadline")

# sequential drops with ingestion barriers: deterministic batch
# boundaries regardless of host load (a pre-staged multi-file dir can
# legally coalesce into one batch and change the crossing count)
write("batch1.parquet", ["hot"]*3 + ["warm"])
spark = (SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
stream = spark.readStream.schema(HH_TOKENS_DDL).parquet(d)
q = (stream_heavy_hitters_tws(stream, min_count=5)
     .writeStream.format("memory").queryName("hh_tws")
     .option("checkpointLocation", d + "_ckpt").start())

def rows_seen():
    total = sum(p["numInputRows"] for p in q.recentProgress)
    return total or None

poll(lambda: rows_seen() if (rows_seen() or 0) >= 4 else None)
write("batch2.parquet", ["hot"]*2 + ["warm", "cold"])
rows = poll(lambda: spark.sql("select * from hh_tws").collect() or None)
write("batch3.parquet", ["hot"]*2)
poll(lambda: True if (rows_seen() or 0) >= 10 else None)
rows = spark.sql("select * from hh_tws").collect()
q.stop()
print("RESULT:" + json.dumps(sorted((r.tok, int(r["count"])) for r in rows)))
"""


def _run_tws_via_pbshim(tmp_path) -> list:
    """Full end-to-end transformWithStateInPandas run in a subprocess
    whose PYTHONPATH carries tools/pbshim: sitecustomize activates the
    GCloud-SDK-vendored pure-Python protobuf 6.32 (with the same-major
    minor-version gate relaxed) in the driver, the streaming driver
    worker, and every task worker — the three interpreters that speak
    the state-server wire protocol."""
    import json
    import os as _os
    import subprocess
    import sys as _sys

    job = tmp_path / "job.py"
    job.write_text(_SHIM_JOB)
    data = tmp_path / "shim_toks"
    data.mkdir()
    env = dict(_os.environ)
    env["PYTHONPATH"] = "/root/repo:/root/repo/tools/pbshim"
    proc = subprocess.run(
        [_sys.executable, str(job), str(data)],
        capture_output=True, text=True, timeout=360, env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(
        l for l in proc.stdout.splitlines() if l.startswith("RESULT:")
    )
    return [tuple(r) for r in json.loads(line[len("RESULT:"):])]


@pytest.mark.skipif(
    not (_HAS_PROTOBUF or _HAS_PBSHIM),
    reason="transformWithStateInPandas needs google.protobuf (absent in "
    "this image, and no GCloud-SDK vendored runtime to shim via "
    "tools/pbshim); logic pinned by the unit test below",
)
def test_tws_promotion_matches_apply_in_pandas_variant(
    spark, tok_stream_dir, tmp_path
):
    if not _HAS_PROTOBUF:
        # no in-process protobuf: run the identical scenario end to end
        # in a pbshim subprocess (real RocksDB state store, real wire
        # protocol) and pin the same contract
        assert _run_tws_via_pbshim(tmp_path) == [("hot", 5)]
        return
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(HH_TOKENS_DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(tok_stream_dir)
        )
        q = (
            stream_heavy_hitters_tws(stream, min_count=5)
            .writeStream.format("memory")
            .queryName("hh_tws")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        deadline = time.time() + 300
        rows = []
        while time.time() < deadline:
            rows = spark.sql("select * from hh_tws").collect()
            if rows and q.lastProgress and (
                q.lastProgress["numInputRows"] == 0
            ):
                break
            time.sleep(2)
        q.stop()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    # identical contract to the applyInPandasWithState pin: the hot
    # key promotes exactly once at its crossing count; warm/cold never
    assert [(r.tok, r["count"]) for r in rows] == [("hot", 5)]


class _FakeValueState:
    """Minimal ValueState double: exists/get/update, records the TTL
    the processor asked for."""

    def __init__(self):
        self.value = None
        self.ttl_ms = None

    def exists(self):
        return self.value is not None

    def get(self):
        return self.value

    def update(self, v):
        self.value = tuple(v)


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        st = _FakeValueState()
        st.ttl_ms = ttlDurationMs
        self.states[name] = st
        return st


def _drive(proc, key, batches):
    """Feed per-micro-batch pandas frames through handleInputRows and
    collect emitted (tok, count) rows."""
    import pandas as pd

    out = []
    for toks in batches:
        pdfs = [pd.DataFrame({"tok": toks})] if toks else []
        for emitted in proc.handleInputRows((key,), iter(pdfs), None):
            out.extend(
                (r.tok, int(r["count"])) for _, r in emitted.iterrows()
            )
    return out


def test_tws_processor_logic_unit():
    """Direct pin of the StatefulProcessor state machine — the same
    contract the streaming pin asserts, minus the protobuf wire."""
    from ocr_intern_spark.streaming.extract_stream import (
        HeavyHittersProcessor,
    )

    handle = _FakeHandle()

    # hot crosses min_count=5 inside batch 2 → exactly one emission
    # with the crossing count; later batches grow state silently.
    hot = HeavyHittersProcessor(5, idle_ttl_ms=600_000)
    hot.init(handle)
    assert handle.states["hh"].ttl_ms == 600_000  # store-enforced decay
    assert _drive(hot, "hot", [["hot"] * 3, ["hot"] * 2, ["hot"] * 2]) == [
        ("hot", 5)
    ]
    assert handle.states["hh"].value == (7, True)

    # warm never reaches the threshold → zero emissions, state kept
    warm = HeavyHittersProcessor(5, idle_ttl_ms=600_000)
    warm.init(_FakeHandle())
    assert _drive(warm, "warm", [["warm"], ["warm"]]) == []

    # a key whose state decayed (TTL wiped it) re-counts from zero and
    # can promote again — exists() False path
    again = HeavyHittersProcessor(2, idle_ttl_ms=1)
    h2 = _FakeHandle()
    again.init(h2)
    assert _drive(again, "x", [["x", "x"]]) == [("x", 2)]
    h2.states["hh"].value = None  # simulate store TTL expiry
    assert _drive(again, "x", [["x", "x"]]) == [("x", 2)]
