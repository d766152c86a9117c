import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

def bench(fn, args, n=10):
    sync = jax.jit(lambda o: jnp.sum(jax.tree_util.tree_leaves(o)[0].ravel()[::257].astype(jnp.float32)))
    _ = float(sync(fn(*args)))
    ts=[]
    for _ in range(3):
        t0=time.perf_counter()
        for _ in range(n): o=fn(*args)
        _=float(sync(o)); ts.append(time.perf_counter()-t0)
    return (np.median(ts)*1e3-26)/n

rng = np.random.default_rng(0)
R, P = 16384, 12
F = R * P
n_oct = 43750000
occ = jnp.asarray(rng.integers(0, 2**31, (n_oct,16), dtype=np.int64).astype(np.int32))
q0 = jnp.asarray(rng.integers(0, n_oct, (R,P), dtype=np.int64).astype(np.int32))
need_h = rng.random((R,P)) < 0.22
need = jnp.asarray(need_h)
print("mean needy/row:", need_h.sum(1).mean(), "p99:", np.percentile(need_h.sum(1),99))

@jax.jit
def full_gather(occ, q0):
    return jnp.take(occ, q0.reshape(-1), axis=0, mode="clip")
print(f"full gather F={F}: {bench(full_gather,(occ,q0)):6.2f} ms", flush=True)

def rowpool(Pneed):
    @jax.jit
    def f(occ, q0, need):
        # per-row pack: needy first (by column), then gather Pneed cols
        col = jnp.broadcast_to(jnp.arange(P, dtype=jnp.uint32)[None,:], (R,P))
        packed = (jnp.where(need, jnp.uint32(0), jnp.uint32(1)) << jnp.uint32(8)) | col
        perm = (jax.lax.sort(packed, dimension=1, is_stable=False) & jnp.uint32(0xFF)).astype(jnp.int32)
        psel = perm[:, :Pneed]
        qsel = jnp.take_along_axis(q0, psel, axis=1)     # (R, Pneed) element gather
        rows = jnp.take(occ, qsel.reshape(-1), axis=0, mode="clip").reshape(R, Pneed, 16)
        # unsort: per-row 17-operand narrow sort back to window order
        pad = jnp.full((R, P - Pneed), jnp.uint32(255), jnp.uint32)
        key_back = jnp.concatenate([psel.astype(jnp.uint32), pad], axis=1)
        rows_p = jnp.concatenate([rows, jnp.zeros((R, P-Pneed, 16), jnp.int32)], axis=1)
        ops = (key_back,) + tuple(rows_p[:, :, i] for i in range(16))
        out = jax.lax.sort(ops, dimension=1, num_keys=1, is_stable=False)
        return jnp.stack(out[1:], axis=2)
    return f

for Pneed in (4, 6, 8):
    print(f"rowpool Pneed={Pneed}: {bench(rowpool(Pneed),(occ,q0,need)):6.2f} ms", flush=True)

# lookup flavor: 32B bucket rows
tab = jnp.asarray(rng.integers(0, 2**31, (2**26, 8), dtype=np.int64).astype(np.int32))
@jax.jit
def lk_full(tab, q0):
    return jnp.take(tab, q0.reshape(-1), axis=0, mode="clip")
print(f"bucket full gather: {bench(lk_full,(tab,q0)):6.2f} ms", flush=True)
def lk_rowpool(Pneed):
    @jax.jit
    def f(tab, q0, need):
        col = jnp.broadcast_to(jnp.arange(P, dtype=jnp.uint32)[None,:], (R,P))
        packed = (jnp.where(need, jnp.uint32(0), jnp.uint32(1)) << jnp.uint32(8)) | col
        perm = (jax.lax.sort(packed, dimension=1, is_stable=False) & jnp.uint32(0xFF)).astype(jnp.int32)
        psel = perm[:, :Pneed]
        qsel = jnp.take_along_axis(q0, psel, axis=1)
        rows = jnp.take(tab, qsel.reshape(-1), axis=0, mode="clip").reshape(R, Pneed, 8)
        pad = jnp.full((R, P - Pneed), jnp.uint32(255), jnp.uint32)
        key_back = jnp.concatenate([psel.astype(jnp.uint32), pad], axis=1)
        rows_p = jnp.concatenate([rows, jnp.zeros((R, P-Pneed, 8), jnp.int32)], axis=1)
        ops = (key_back,) + tuple(rows_p[:, :, i] for i in range(8))
        out = jax.lax.sort(ops, dimension=1, num_keys=1, is_stable=False)
        return jnp.stack(out[1:], axis=2)
    return f
for Pneed in (4, 6):
    print(f"bucket rowpool Pneed={Pneed}: {bench(lk_rowpool(Pneed),(tab,q0,need)):6.2f} ms", flush=True)
