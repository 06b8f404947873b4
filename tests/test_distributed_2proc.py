"""Genuine multi-process distributed run (SURVEY.md §2.11).

Launches TWO real localhost processes that each call
``jax.distributed.initialize`` (CPU backend), feed their own Loader shard
through ``host_local_batch`` (``jax.make_array_from_process_local_data``),
and execute one jitted train step over the 2-device global mesh.  The
parent asserts both processes report the same global loss, and that it
matches a single-process run over the same global batch — the proof that
the multi-host data path (per-process sharding + global array assembly +
XLA collectives) computes the same answer as one process.

The reference has no distributed code at all (Lightning ``gpus: -1`` flag
only, configs/config.yaml:59); this is the TPU-native equivalent's
correctness gate.  Runs under RUN_SLOW=1 (two cold CPU compiles).
"""

import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

SLOW = os.environ.get("RUN_SLOW", "0") != "1"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = textwrap.dedent("""
    import json, os, sys
    sys.path.insert(0, __REPO__)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(__REPO__, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    from objectdetectionpl_tpu.parallel import (
        data_shard, host_local_batch, maybe_initialize)
    ok = maybe_initialize(coordinator_address="localhost:" + port,
                          num_processes=nproc, process_id=pid)
    assert ok and jax.process_count() == nproc

    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from objectdetectionpl_tpu.data.pipeline import Loader
    from objectdetectionpl_tpu.data.synthetic import SyntheticParser
    from objectdetectionpl_tpu.models import build_model
    from objectdetectionpl_tpu.ops import losses as loss_lib
    from objectdetectionpl_tpu.parallel import make_mesh
    from objectdetectionpl_tpu.train import state as state_lib
    from objectdetectionpl_tpu.train import step as step_lib

    C, S = 3, 64
    GLOBAL_BATCH = 4
    num_shards, shard_id = data_shard()
    assert (num_shards, shard_id) == (nproc, pid)
    loader = Loader(SyntheticParser(8, img_hw=S), img_size=S,
                    batch_size=GLOBAL_BATCH // nproc, max_boxes=8,
                    shuffle=False, num_shards=num_shards, shard_id=shard_id)
    batch = next(iter(loader))

    mesh = make_mesh(shape=(len(jax.devices()), 1))
    model = build_model("YOLOv2", C)
    loss_fn = loss_lib.make_loss("YOLOv2", C, S)
    tx = optax.sgd(1.0)
    st = state_lib.create_train_state(model, tx, jax.random.PRNGKey(0), S,
                                      batch_size=1)
    rep = NamedSharding(mesh, P())
    st = jax.tree.map(lambda x: jax.device_put(x, rep), st)
    step = step_lib.make_train_step(model, loss_fn, tx, accum_steps=1)

    with jax.set_mesh(mesh):
        args = [host_local_batch(mesh, np.asarray(v)[None],
                                 spec=P(None, "data"))
                for v in (batch.images, batch.labels, batch.boxes,
                          batch.mask)]
        st, metrics = step(st, *args)
        # post-step parameter norm: catches symmetric all-reduce scaling
        # bugs (e.g. a missing 1/N) that leave both processes' loss equal
        pnorm = float(np.sqrt(sum(
            float(np.square(np.asarray(x.addressable_data(0),
                                       np.float64)).sum())
            for x in jax.tree.leaves(st.params))))
        print("RESULT " + json.dumps(
            {"pid": pid, "loss": float(metrics["loss"]), "pnorm": pnorm,
             "devices": len(jax.devices()),
             "local": len(jax.local_devices())}), flush=True)
""")


@pytest.mark.skipif(SLOW, reason="two cold CPU compiles (set RUN_SLOW=1)")
def test_two_process_distributed_matches_single():
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    port = "12477"

    script = _CHILD.replace("__REPO__", repr(REPO))
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script, str(pid), "2", port],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env_base,
            text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"child failed:\n{out}\n{err[-3000:]}"
        outs.append(out)

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out
        results.append(json.loads(lines[0][len("RESULT "):]))

    # both processes see the 2-device global mesh but address only 1 device
    for r in results:
        assert r["devices"] == 2 and r["local"] == 1
    # identical global loss on both processes (same collective result)
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)

    # single-process reference over the same global batch
    import jax
    import optax
    from objectdetectionpl_tpu.data.pipeline import Loader
    from objectdetectionpl_tpu.data.synthetic import SyntheticParser
    from objectdetectionpl_tpu.models import build_model
    from objectdetectionpl_tpu.ops import losses as loss_lib
    from objectdetectionpl_tpu.train import state as state_lib
    from objectdetectionpl_tpu.train import step as step_lib
    import jax.numpy as jnp

    C, S = 3, 64
    shards = [Loader(SyntheticParser(8, img_hw=S), img_size=S, batch_size=2,
                     max_boxes=8, shuffle=False, num_shards=2, shard_id=i)
              for i in range(2)]
    batches = [next(iter(s)) for s in shards]
    images = np.concatenate([b.images for b in batches])[None]
    labels = np.concatenate([b.labels for b in batches])[None]
    boxes = np.concatenate([b.boxes for b in batches])[None]
    mask = np.concatenate([b.mask for b in batches])[None]

    model = build_model("YOLOv2", C)
    loss_fn = loss_lib.make_loss("YOLOv2", C, S)
    tx = optax.sgd(1.0)
    st = state_lib.create_train_state(model, tx, jax.random.PRNGKey(0), S,
                                      batch_size=1)
    step = step_lib.make_train_step(model, loss_fn, tx, accum_steps=1)
    st2, metrics = step(st, *(jnp.asarray(v) for v in
                              (images, labels, boxes, mask)))
    single = float(metrics["loss"])
    assert results[0]["loss"] == pytest.approx(single, rel=1e-4)
    # post-step param norm parity (see child comment): identical across the
    # two processes, and equal to the single-process value
    single_pnorm = float(np.sqrt(sum(
        float(np.square(np.asarray(x, np.float64)).sum())
        for x in jax.tree.leaves(st2.params))))
    assert results[0]["pnorm"] == pytest.approx(results[1]["pnorm"],
                                                rel=1e-6)
    assert results[0]["pnorm"] == pytest.approx(single_pnorm, rel=1e-4)
