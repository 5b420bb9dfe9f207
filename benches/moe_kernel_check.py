"""Real-TPU check + microbench for the gathered-expert MoE kernel.

Compares moe_gather_matmul / moe_mlp_gathered against the dense oracle
ON DEVICE (the interpret-mode oracle tests run in CI; this validates the
compiled kernel), then times gathered vs dense at a Mixtral-like layer
shape to show the k/E traffic win."""

import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from tinygpt_tpu.hf.config import parse_model_config
    from tinygpt_tpu.models.causal_lm import moe_mlp
    from tinygpt_tpu.ops.moe_kernels import moe_gather_matmul, moe_mlp_gathered

    assert jax.devices()[0].platform == "tpu", "needs the real TPU"
    rng = np.random.default_rng(0)

    # correctness at a small shape
    L, E, IN, OUT, R = 2, 4, 512, 1024, 6
    w = jnp.asarray(rng.normal(size=(L, E, IN, OUT)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(R, IN)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, E, R).astype(np.int32))
    got = np.asarray(moe_gather_matmul(x, w, jnp.int32(1), idx))
    ref = np.asarray(jnp.einsum("ri,rio->ro", x.astype(jnp.float32),
                                w[1, idx].astype(jnp.float32)))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
    print(f"gather_matmul rel err: {err:.2e}")
    assert err < 2e-2, err

    # routed-MLP parity vs the dense oracle
    cfg = parse_model_config({
        "model_type": "mixtral", "vocab_size": 128, "hidden_size": 512,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "intermediate_size": 1024,
        "num_local_experts": 4, "num_experts_per_tok": 2,
        "max_position_embeddings": 64, "rms_norm_eps": 1e-5,
    })
    router = jnp.asarray(rng.normal(size=(512, 4)).astype(np.float32)
                         ).astype(jnp.bfloat16)
    gw = (jnp.asarray(rng.normal(size=(2, 4, 512, 2048)).astype(np.float32))
          * 0.1).astype(jnp.bfloat16)
    dw = (jnp.asarray(rng.normal(size=(2, 4, 1024, 512)).astype(np.float32))
          * 0.1).astype(jnp.bfloat16)
    h = jnp.asarray(rng.normal(size=(3, 1, 512)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    lp = {"router_w": router, "moe_gate_up_w": gw[0], "moe_down_w": dw[0]}
    ref = np.asarray(moe_mlp(h.astype(jnp.float32),
                             {k: v.astype(jnp.float32) for k, v in lp.items()},
                             cfg))
    got = np.asarray(moe_mlp_gathered(h, router, gw, dw, jnp.int32(0), cfg)
                     ).astype(np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
    print(f"moe_mlp rel err (bf16 vs f32 oracle): {err:.2e}")
    assert err < 5e-2, err

    # int4 gathered kernel on device
    from tinygpt_tpu.ops.quant import _quantize_moe_stacked, dequantize
    from tinygpt_tpu.ops.moe_kernels import moe_gather_matmul_int4

    qt = _quantize_moe_stacked(
        jnp.asarray(rng.normal(size=(2, 4, 512, 1024)).astype(np.float32)),
        bits=4, group_size=128)
    x4 = jnp.asarray(rng.normal(size=(6, 512)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    idx4 = jnp.asarray(rng.integers(0, 4, 6).astype(np.int32))
    got = np.asarray(moe_gather_matmul_int4(
        x4, qt.data, qt.scales, jnp.int32(1), idx4, group=qt.group_size))
    wd = dequantize(qt, dtype=jnp.float32)
    ref = np.asarray(jnp.einsum("ri,rio->ro", x4.astype(jnp.float32),
                                wd[1, idx4]))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
    print(f"int4 gather_matmul rel err: {err:.2e}")
    assert err < 2e-2, err

    # microbench: Mixtral-8x7B-like single layer, B=4 k=2 vs dense E=8
    E, H, I, B, k = 8, 4096, 14336, 4, 2
    gw = (jax.random.normal(jax.random.PRNGKey(0), (1, E, H, 2 * I),
                            jnp.bfloat16) * 0.02)
    dwb = (jax.random.normal(jax.random.PRNGKey(1), (1, E, I, H),
                             jnp.bfloat16) * 0.02)
    router = jax.random.normal(jax.random.PRNGKey(2), (H, E), jnp.bfloat16)
    hb = jax.random.normal(jax.random.PRNGKey(3), (B, 1, H), jnp.bfloat16)
    cfg8 = parse_model_config({
        "model_type": "mixtral", "vocab_size": 128, "hidden_size": H,
        "num_hidden_layers": 1, "num_attention_heads": 32,
        "num_key_value_heads": 8, "intermediate_size": I,
        "num_local_experts": E, "num_experts_per_tok": k,
        "max_position_embeddings": 64, "rms_norm_eps": 1e-5,
    })

    # weights ride as ARGUMENTS: closing over the 2.8 GB expert stacks
    # embeds them as jit constants, re-serialized per program through the
    # tunnel (minutes of hang, observed live)
    @jax.jit
    def gathered(hh, rw, g, d):
        return moe_mlp_gathered(hh, rw, g, d, jnp.int32(0), cfg8)

    @jax.jit
    def dense(hh, rw, g, d):
        return moe_mlp(hh, {"router_w": rw, "moe_gate_up_w": g[0],
                            "moe_down_w": d[0]}, cfg8)

    for name, fn in (("gathered", gathered), ("dense", dense)):
        out = fn(hb, router, gw, dwb)
        np.asarray(out)  # compile + fence
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(hb + out * 0, router, gw, dwb)  # data-dependent chain
        np.asarray(out)
        dt = (time.perf_counter() - t0) / reps
        byt = (B * k if name == "gathered" else E) * 3 * H * I
        print(f"{name}: {dt*1e3:.2f} ms/layer "
              f"({byt/1e9/dt:.0f} GB/s of expert bytes)")


if __name__ == "__main__":
    main()
