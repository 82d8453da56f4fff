import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from infercnv_tpu.core.genome import GeneOrder
from infercnv_tpu.ops.layout import LANE, smoothing_operator
from infercnv_tpu.ops.smoothing import _apply_banded

n_chr=22
sizes=np.linspace(800,120,n_chr).astype(int); sizes=(sizes/sizes.sum()*8448).astype(int); sizes[0]+=8448-sizes.sum()
G=int(sizes.sum())
go=GeneOrder(names=tuple(f"g{i}" for i in range(G)), chr_names=tuple(f"chr{i+1}" for i in range(n_chr)),
             chr_ids=np.repeat(np.arange(n_chr),sizes).astype(np.int32), start=np.arange(G), stop=np.arange(G))
op = smoothing_operator(go, 101, "pyramidinal")
blocks = jnp.asarray(op.blocks)
C=8192
rng=np.random.default_rng(0)
x=jnp.asarray(rng.normal(0,1,(C,G)).astype(np.float32))
xref = op.apply_np(np.asarray(x,np.float64))

@partial(jax.jit, static_argnames=("n_tiles","side_tiles","num_genes","prec"))
def apply2(x, blocks, n_tiles, side_tiles, num_genes, prec):
    C = x.shape[0]
    padded = n_tiles * LANE
    S = side_tiles
    xp = jnp.zeros((C, (n_tiles + 2*S) * LANE), x.dtype).at[:, S*LANE:S*LANE+num_genes].set(x)
    xt = xp.reshape(C, n_tiles + 2*S, LANE)
    out = jnp.zeros((C, n_tiles, LANE), jnp.float32)
    for s in range(-S, S + 1):
        xs = jax.lax.slice_in_dim(xt, S + s, S + s + n_tiles, axis=1)
        out = out + jnp.einsum("ctg,tgh->cth", xs, blocks[s + S],
                               preferred_element_type=jnp.float32, precision=prec)
    return out.reshape(C, padded)[:, :num_genes]

def bench(fn, n=20):
    out=fn(); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(n): out=fn()
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/n*1e3

base = lambda: _apply_banded(x, blocks, op.n_tiles, op.side_tiles, op.num_genes)
print("current (concat, HIGHEST):", f"{bench(base):.2f} ms")
for prec in ("highest","high","default"):
    f = lambda: apply2(x, blocks, op.n_tiles, op.side_tiles, op.num_genes, prec)
    got = np.asarray(f())
    err = np.abs(got - xref).max()
    print(f"slice, {prec}: {bench(f):.2f} ms, max err vs f64 host: {err:.2e}")
