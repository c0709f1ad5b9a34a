import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp, numpy as np
from functools import partial
from ggllm_tpu.core.config import EngineConfig, FalconHParams
from ggllm_tpu.models.falcon import FalconStatic, layer_norm, _attention
from ggllm_tpu.ops.rope import rope_angles, apply_rope
from ggllm_tpu.utils.benchgen import _tiled_random

hp = FalconHParams.falcon7b(); L = 8
st = FalconStatic.from_hparams(hp)
E,H,KV,D,F = hp.n_embd,hp.n_head,hp.n_head_kv,hp.head_dim,hp.n_ff
inv_freq = rope_angles(EngineConfig().rope, 2048, D)
def dw(*s): return jnp.asarray(_tiled_random(s, 0.02), jnp.bfloat16)
lw = {"wq": dw(L,H*D,E), "wk": dw(L,KV*D,E), "wv": dw(L,KV*D,E), "wo": dw(L,E,H*D),
      "ffn_up": dw(L,F,E), "ffn_down": dw(L,E,F),
      "ln_w": jnp.ones((L,E),jnp.float32), "ln_b": jnp.zeros((L,E),jnp.float32)}
lw = jax.device_put(lw)
kvk = jnp.zeros((L,1,2048,KV,D), jnp.bfloat16); kvv = jnp.zeros((L,1,2048,KV,D), jnp.bfloat16)

def mm(x, w): return jax.lax.dot_general(x, w, (((x.ndim-1,),(1,)),((),())), preferred_element_type=jnp.float32).astype(jnp.bfloat16)

def bench(step, name):
    f = jax.jit(step)
    x = jnp.zeros((1,1,E), jnp.bfloat16)
    t0=time.time(); y = f(x, lw); y.block_until_ready()
    print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)
    t0=time.perf_counter(); iters=32
    for _ in range(iters): y = f(y, lw)
    y.block_until_ready()
    dt=(time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1e3:6.2f} ms", flush=True)

def p1(x, lw):
    for l in range(L):
        a = mm(mm(x, lw["wq"][l]).reshape(1,1,H*D), lw["wo"][l])
        f_ = mm(mm(x, lw["ffn_up"][l]), lw["ffn_down"][l])
        x = (x + a + f_) * 0.5
    return x
bench(p1, "P1 matmuls only        ")

def p2(x, lw):
    n_past = jnp.int32(1)
    for l in range(L):
        ln = layer_norm(x, lw["ln_w"][l], lw["ln_b"][l])
        q = mm(ln, lw["wq"][l]).reshape(1,1,H,D)
        k = mm(ln, lw["wk"][l]).reshape(1,1,KV,D)
        v = mm(ln, lw["wv"][l]).reshape(1,1,KV,D)
        pos = n_past + jnp.arange(1, dtype=jnp.int32)[None]
        q = apply_rope(q, pos, inv_freq); k = apply_rope(k, pos, inv_freq)
        a = mm((q.reshape(1,1,H*D) + jnp.sum(k)+jnp.sum(v)), lw["wo"][l])
        f_ = mm(jax.nn.gelu(mm(ln, lw["ffn_up"][l]).astype(jnp.float32), approximate=True).astype(jnp.bfloat16), lw["ffn_down"][l])
        x = x + a + f_
    return x * 0.01
bench(p2, "P2 +norm+rope (no attn)")

def p3(x, lw):
    n_past = jnp.int32(1)
    kk, vv = kvk, kvv
    for l in range(L):
        ln = layer_norm(x, lw["ln_w"][l], lw["ln_b"][l])
        q = mm(ln, lw["wq"][l]).reshape(1,1,H,D)
        k = mm(ln, lw["wk"][l]).reshape(1,1,KV,D)
        v = mm(ln, lw["wv"][l]).reshape(1,1,KV,D)
        pos = n_past + jnp.arange(1, dtype=jnp.int32)[None]
        q = apply_rope(q, pos, inv_freq); k = apply_rope(k, pos, inv_freq)
        kc = jax.lax.dynamic_update_slice(kk[l], k.astype(kvk.dtype), (0, n_past, 0, 0))
        vc = jax.lax.dynamic_update_slice(vv[l], v.astype(kvk.dtype), (0, n_past, 0, 0))
        attn = _attention(q, kc, vc, n_past, st)
        a = mm(attn.reshape(1,1,H*D), lw["wo"][l])
        f_ = mm(jax.nn.gelu(mm(ln, lw["ffn_up"][l]).astype(jnp.float32), approximate=True).astype(jnp.bfloat16), lw["ffn_down"][l])
        x = x + a + f_
    return x * 0.01
bench(p3, "P3 full layer          ")
