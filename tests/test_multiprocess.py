"""REAL 2-process ``jax.distributed`` execution of the sharded stack.

The rest of the suite (and the driver's dryrun) validates multi-chip
sharding on a single-process virtual mesh, where every array is fully
addressable — which silently passes code that would break on a real
multi-host slice.  This test spawns two OS processes, each owning 4
virtual CPU devices of one 8-device global mesh, with Gloo carrying the
cross-process collectives, and runs the beyond-capacity streaming
workload end-to-end (tests/mp_worker.py).  It caught three real bugs the
single-process suite could not see:

- ``distributed.initialize``'s idempotency guard called
  ``jax.process_count()``, which initializes the backend and makes the
  real initialize fail ("must be called before any JAX calls"),
- ``distributed.fetch`` called ``process_allgather`` without
  ``tiled=True``, a ``ValueError`` for every non-fully-addressable
  array (the exact case it exists for),
- checkpointing saved only the calling process's BlockStore shard and
  reloaded the global union into every process (foreign rows can never
  be restored from a non-owner — they would sit dead in the store).

SURVEY.md §2b: the reference is single-process/single-GPU; multi-host is
the BASELINE north star dimension.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(tmp_path, mode):
    """Run the two workers to completion; return their parsed results.
    Bounded by communicate(timeout=...) (pytest-timeout is not installed
    in this image)."""
    port = _free_port()
    # worker stdout goes to FILES, not pipes: a crashing worker can
    # flood a 64KB pipe and block while its peer blocks in a collective
    # — the pair would then ride out the full timeout with the real
    # error lost
    logs = [open(tmp_path / f"worker_{i}.log", "w+") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), str(port), str(tmp_path),
             mode],
            stdout=logs[i], stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]

    def _read_logs():
        out = []
        for f in logs:
            f.flush()
            f.seek(0)
            out.append(f.read())
            f.close()
        return out

    try:
        for p in procs:
            p.wait(timeout=840)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("2-process workers timed out:\n"
                    + "\n".join(_read_logs()))
    outs = _read_logs()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    res = []
    for i in range(2):
        with open(tmp_path / f"result_{i}.json") as f:
            res.append(json.load(f))
    return res


def test_two_process_streaming_slam(tmp_path):
    res = _launch(tmp_path, "stream")

    for r in res:
        assert r["process_count"] == 2
        assert r["local_devices"] == 4 and r["global_devices"] == 8
        # the primitives saw genuinely non-addressable arrays
        assert r["not_addressable"]
        assert r["fetch_ok"] and r["local_rows_ok"] and r["gather_concat_ok"]
        # the beyond-capacity run tracked (same bound as the
        # single-process twin) and actually streamed
        assert r["ate"] < 0.1, r["ate"]
        assert r["total_evicted"] > 0
        assert r["total_restored"] > 0
        # per-process store shard: only locally-owned blocks
        assert r["store_local_only"]
        # checkpoint resume matched the uninterrupted run
        assert r["resume_close"], "resume diverged from uninterrupted run"
        # per-process shard checkpoint reconstructed the same state
        assert r["pp_state_equal"] and r["pp_store_equal"]

    # SPMD at the host level: every process computed the identical
    # replicated results — trajectories are bit-equal across processes
    t0 = np.asarray(res[0]["trajectory"])
    t1 = np.asarray(res[1]["trajectory"])
    assert np.array_equal(t0, t1), "processes diverged"
    assert res[0]["resumed_pose"] == res[1]["resumed_pose"]
    # device map contents agree (fetch is collective and global)
    assert res[0]["dev_keys"] == res[1]["dev_keys"]

    # the store shards PARTITION the evicted set: disjoint, and their
    # union equals what each process reloaded from the global checkpoint
    s0, s1 = set(res[0]["store_keys"]), set(res[1]["store_keys"])
    assert not (s0 & s1), "store shards overlap"
    l0, l1 = (set(res[0]["loaded_store_keys"]),
              set(res[1]["loaded_store_keys"]))
    assert l0 == s0 and l1 == s1, "checkpoint did not round-trip the shards"

    # both processes' checkpoints recorded the same GLOBAL state
    with np.load(tmp_path / "ckpt_0.npz") as z0, \
            np.load(tmp_path / "ckpt_1.npz") as z1:
        assert sorted(z0.files) == sorted(z1.files)
        for k in z0.files:
            np.testing.assert_array_equal(z0[k], z1[k], err_msg=k)
        if s0 or s1:
            assert set(int(v) for v in z0["store.keys"]) == s0 | s1


def test_two_process_keyframe_backend(tmp_path):
    """The FULL flagship stack — keyframe backend with loop closure, BA,
    graph growth, and map rebuild over the streaming sharded frontend
    (the BASELINE config-5 composition) — runs identically on both
    processes of a real 2-process mesh, checkpoint/resume included."""
    res = _launch(tmp_path, "kf")

    for r in res:
        assert r["ate"] < 0.1, r["ate"]
        # same behavior bar as the single-process twin: the graph GREW
        # past its deliberately undersized capacity, loop edges exist
        # beyond the odometry chain, and the map streamed
        assert r["n_keyframes"] > 4
        assert "grow_keyframes" in r["capacity_kinds"]
        assert r["n_edges"] > r["n_keyframes"] - 1
        assert r["total_evicted"] > 0
        assert r["resumed_keyframes"] >= r["n_keyframes"]

    # host-level SPMD: every backend decision (keyframe insertion, BA,
    # rebuild, relocalization) resolved identically on both processes
    assert res[0]["n_keyframes"] == res[1]["n_keyframes"]
    assert res[0]["n_edges"] == res[1]["n_edges"]
    assert res[0]["ba_runs"] == res[1]["ba_runs"]
    t0 = np.asarray(res[0]["trajectory"])
    t1 = np.asarray(res[1]["trajectory"])
    assert np.array_equal(t0, t1), "processes diverged"
    assert res[0]["resumed_pose"] == res[1]["resumed_pose"]
    # per-process store shards stay disjoint under the full backend
    assert not (set(res[0]["store_keys"]) & set(res[1]["store_keys"]))

    with np.load(tmp_path / "kf_ckpt_0.npz") as z0, \
            np.load(tmp_path / "kf_ckpt_1.npz") as z1:
        assert sorted(z0.files) == sorted(z1.files)
        for k in z0.files:
            if k == "extra.events_json":
                # event logs carry host wall-clock ("..._s" keys: ba_s,
                # rebuild_s, stage laps) which legitimately differs per
                # process; everything else must agree exactly
                e0 = _strip_timings(json.loads(bytes(z0[k]).decode()))
                e1 = _strip_timings(json.loads(bytes(z1[k]).decode()))
                assert e0 == e1, "event logs diverged beyond timings"
            else:
                np.testing.assert_array_equal(z0[k], z1[k], err_msg=k)


def _strip_timings(obj):
    if isinstance(obj, dict):
        return {k: _strip_timings(v) for k, v in obj.items()
                if not k.endswith("_s")}
    if isinstance(obj, list):
        return [_strip_timings(v) for v in obj]
    return obj
