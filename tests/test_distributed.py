"""Multi-host runtime tests: a REAL 2-process jax.distributed run on CPU
(the honest correctness substitute for >=2 TPU hosts, which this
environment cannot provide — SURVEY §4). Each process owns 4 virtual CPU
devices; the engine builds a hybrid (dcn_dp=2) x (tp=4) mesh, feeds
host-local batch shards, and both processes must produce the same greedy
streams as a single-process run of the same mesh shape."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.fixtures import build_full_model_dir

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["TG_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["TG_COORD"],
    num_processes=2,
    process_id=int(os.environ["TG_PID"]),
)
assert jax.process_count() == 2 and jax.device_count() == 8, (
    jax.process_count(), jax.device_count())

from tinygpt_tpu.engine.engine import GPTConfig, GPTEngine
from tinygpt_tpu.ops.sampling import SamplerConfig

eng = GPTEngine(GPTConfig(
    model_dir=os.environ["TG_MODEL"], dtype="float32", max_tokens=6,
    decode_chunk=3, mesh_shape=(2, 1, 4), sampler=SamplerConfig(),
))
eng.prepare()
outs = eng.generate_sync(["Hello there", "Counting: one two three"])
print("RESULT " + json.dumps([o.token_ids for o in outs]))
"""


SERVING_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["TG_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["TG_COORD"],
    num_processes=2,
    process_id=int(os.environ["TG_PID"]),
)
import jax.numpy as jnp
from tinygpt_tpu.engine.scheduler import (
    ContinuousBatcher, Request, SchedulerConfig)
from tinygpt_tpu.hf.config import load_model_config
from tinygpt_tpu.hf.safetensors_io import load_safetensors_dir
from tinygpt_tpu.models import get_model

cfg = load_model_config(os.environ["TG_MODEL"])
model = get_model(cfg.model_type)
params = model.load_params(cfg, load_safetensors_dir(os.environ["TG_MODEL"]),
                           dtype=jnp.float32)
# dp=2 spans the two processes (1 shard per host), tp=4 within each
batcher = ContinuousBatcher(
    model, cfg, params, eos_ids=set(),
    config=SchedulerConfig(
        batch_capacity=2, block_size=16, n_blocks=64,
        max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
        mesh_shape=(2, 1, 4),
    ),
)
# SPMD serving contract: every process feeds the identical request stream
import numpy as np
rng = np.random.default_rng(5)
for i, n in enumerate((4, 11, 7)):
    batcher.add_request(Request(
        request_id=i,
        prompt_ids=[int(x) for x in rng.integers(2, cfg.vocab_size, n)],
        max_new_tokens=5,
    ))
got = {0: [], 1: [], 2: []}
steps = 0
while batcher.has_work and steps < 100:
    for ev in batcher.step():
        if ev.token_id is not None:
            got[ev.request_id].append(ev.token_id)
    steps += 1
print("RESULT " + json.dumps([got[i] for i in range(3)]))

# round-3 compositions across hosts: SPECULATIVE quanta + CHUNKED
# admission, both row-parallel over the 2-host dp axis
batcher2 = ContinuousBatcher(
    model, cfg, params, eos_ids=set(),
    config=SchedulerConfig(
        batch_capacity=2, block_size=16, n_blocks=64,
        max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
        mesh_shape=(2, 1, 4), decode_quantum=8,
        speculative="ngram", spec_draft_len=3, spec_ngram=2,
        prefill_chunk_tokens=16,
    ),
)
assert batcher2._spec_fn is not None
phrase = [int(x) for x in rng.integers(2, cfg.vocab_size, 5)]
for i, p in enumerate((phrase * 4, phrase * 2)):
    batcher2.add_request(Request(request_id=i, prompt_ids=list(p),
                                 max_new_tokens=5))
got2 = {0: [], 1: []}
steps = 0
while batcher2.has_work and steps < 100:
    for ev in batcher2.step():
        if ev.token_id is not None:
            got2[ev.request_id].append(ev.token_id)
    steps += 1
print("RESULT2 " + json.dumps([got2[i] for i in range(2)]))
"""


@pytest.fixture(scope="module")
def llama_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dist_llama")
    build_full_model_dir(str(d), seed=3, n_layer=2, model_type="llama")
    return str(d)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_serving_matches_single(llama_dir):
    """Multi-host CONTINUOUS BATCHING: a real 2-process run with row
    shards split across hosts (dp=2 over DCN, tp=4 within each) must
    produce identical greedy streams on both hosts, matching a
    single-process run of the same mesh shape (BASELINE config 5:
    flagship serving sharded across >= 2 hosts)."""
    port = _free_port()
    env_base = dict(
        os.environ,
        TG_REPO=REPO,
        TG_MODEL=llama_dir,
        TG_COORD=f"127.0.0.1:{port}",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_PLATFORMS="cpu",
        TINYGPT_NO_COMPILE_CACHE="1",
    )
    procs = []
    for pid in range(2):
        env = dict(env_base, TG_PID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", SERVING_WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, out[-3000:]
        line = next(ln for ln in out.splitlines()
                    if ln.startswith("RESULT "))
        outs.append(json.loads(line[len("RESULT "):]))
        line2 = next(ln for ln in out.splitlines()
                     if ln.startswith("RESULT2 "))
        outs.append(json.loads(line2[len("RESULT2 "):]))
    # outs = [p0 plain, p0 spec+chunked, p1 plain, p1 spec+chunked]
    assert outs[0] == outs[2]
    assert outs[1] == outs[3]
    assert all(len(s) == 5 for s in outs[0]), outs[0]
    assert all(len(s) == 5 for s in outs[1]), outs[1]
    outs = [outs[0]]  # the single-process check below compares plain

    # single-process reference on the same (2, 1, 4) mesh shape
    if len(jax.devices()) < 8:
        pytest.skip("parent has < 8 virtual devices")
    from tinygpt_tpu.engine.scheduler import (
        ContinuousBatcher,
        Request,
        SchedulerConfig,
    )
    from tinygpt_tpu.hf.config import load_model_config
    from tinygpt_tpu.hf.safetensors_io import load_safetensors_dir
    from tinygpt_tpu.models import get_model

    cfg = load_model_config(llama_dir)
    model = get_model(cfg.model_type)
    params = model.load_params(cfg, load_safetensors_dir(llama_dir),
                               dtype=jnp.float32)
    batcher = ContinuousBatcher(
        model, cfg, params, eos_ids=set(),
        config=SchedulerConfig(
            batch_capacity=2, block_size=16, n_blocks=64,
            max_blocks_per_seq=8, prefill_bucket=16, dtype="float32",
            mesh_shape=(2, 1, 4),
        ),
    )
    rng = np.random.default_rng(5)
    prompts = [[int(x) for x in rng.integers(2, cfg.vocab_size, n)]
               for n in (4, 11, 7)]
    for i, p in enumerate(prompts):
        batcher.add_request(Request(request_id=i, prompt_ids=p,
                                    max_new_tokens=5))
    got = {0: [], 1: [], 2: []}
    steps = 0
    while batcher.has_work and steps < 100:
        for ev in batcher.step():
            if ev.token_id is not None:
                got[ev.request_id].append(ev.token_id)
        steps += 1
    ref = [got[i] for i in range(3)]
    if outs[0] != ref:
        # near-tie tolerance across differently-compiled programs
        from tinygpt_tpu.engine.kv_cache import create_kv_cache

        for r, (a, b) in enumerate(zip(outs[0], ref)):
            if a == b:
                continue
            i = next(j for j in range(min(len(a), len(b)))
                     if a[j] != b[j])
            ctx_ids = prompts[r] + a[:i]
            cache = create_kv_cache(cfg, 1, 128, dtype=jnp.float32)
            S = len(ctx_ids)
            logits, _ = model.forward(
                params, cfg, jnp.asarray([ctx_ids], jnp.int32), cache,
                jnp.arange(S)[None, :], jnp.ones((1, S), jnp.bool_),
                last_only=True,
            )
            lg = np.asarray(logits[0, -1])
            top = float(lg.max())
            assert top - lg[a[i]] < 1e-3 and top - lg[b[i]] < 1e-3, (
                f"row {r} diverges at {i} without a near-tie"
            )


def test_two_process_engine_matches_single(llama_dir):
    port = _free_port()
    env_base = dict(
        os.environ,
        TG_REPO=REPO,
        TG_MODEL=llama_dir,
        TG_COORD=f"127.0.0.1:{port}",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_PLATFORMS="cpu",
        TINYGPT_NO_COMPILE_CACHE="1",
    )
    procs = []
    for pid in range(2):
        env = dict(env_base, TG_PID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, out[-3000:]
        line = next(ln for ln in out.splitlines()
                    if ln.startswith("RESULT "))
        outs.append(json.loads(line[len("RESULT "):]))
    # both processes see the identical global token streams
    assert outs[0] == outs[1]

    # single-process reference on the SAME mesh shape (8 local devices)
    if len(jax.devices()) < 8:
        pytest.skip("parent has < 8 virtual devices")
    from tinygpt_tpu.engine.engine import GPTConfig, GPTEngine
    from tinygpt_tpu.ops.sampling import SamplerConfig

    eng = GPTEngine(GPTConfig(
        model_dir=llama_dir, dtype="float32", max_tokens=6,
        decode_chunk=3, mesh_shape=(2, 1, 4), sampler=SamplerConfig(),
    ))
    eng.prepare()
    ref = [o.token_ids
           for o in eng.generate_sync(["Hello there",
                                       "Counting: one two three"])]
    # identical programs on identical (virtual) hardware; exact match —
    # near-tie flips would indicate a real divergence in the distributed
    # input/output plumbing, not compile variance, so compare strictly
    # but fall back to a near-tie check if CPU codegen differs.
    if outs[0] != ref:
        from tinygpt_tpu.hf.config import load_model_config
        from tinygpt_tpu.hf.safetensors_io import load_safetensors_dir
        from tinygpt_tpu.models import get_model
        from tinygpt_tpu.engine.kv_cache import create_kv_cache

        cfg = load_model_config(llama_dir)
        model = get_model(cfg.model_type)
        params = model.load_params(cfg, load_safetensors_dir(llama_dir),
                                   dtype=jnp.float32)
        tok = eng.ctx.tokenizer
        prompts = [tok.encode("Hello there"),
                   tok.encode("Counting: one two three")]
        for r, (a, b) in enumerate(zip(outs[0], ref)):
            if a == b:
                continue
            i = next(j for j in range(min(len(a), len(b)))
                     if a[j] != b[j])
            ctx_ids = prompts[r] + a[:i]
            cache = create_kv_cache(cfg, 1, 128, dtype=jnp.float32)
            S = len(ctx_ids)
            logits, _ = model.forward(
                params, cfg, jnp.asarray([ctx_ids], jnp.int32), cache,
                jnp.arange(S)[None, :], jnp.ones((1, S), jnp.bool_),
                last_only=True,
            )
            lg = np.asarray(logits[0, -1])
            top = float(lg.max())
            assert top - lg[a[i]] < 1e-3 and top - lg[b[i]] < 1e-3, (
                f"row {r} diverges at {i} without a near-tie"
            )
