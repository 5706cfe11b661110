"""Microbench: ConvNeXt block pieces on the real chip.

The axon tunnel has a ~27 ms host round-trip, so each measured graph runs the
op K times inside one jit (carry-chained scan) and we divide by K.
"""
import time
import jax, jax.numpy as jnp
import flax.linen as nn

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)

K_REPS = 20


def timeit(f, *a, n=5):
    r = f(*a)
    float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
        float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n / K_REPS * 1000


B, H, W, C = 8, 96, 160, 96
key = jax.random.PRNGKey(0)
x32 = jax.random.normal(key, (B, H, W, C), jnp.float32)
x16 = x32.astype(jnp.bfloat16)


class Block(nn.Module):
    dim: int
    approx: bool = False
    dw: bool = True

    @nn.compact
    def __call__(self, x):
        s = x
        if self.dw:
            x = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim)(x)
        x = nn.LayerNorm(epsilon=1e-6)(x)
        x = nn.Dense(4 * self.dim)(x)
        x = nn.gelu(x, approximate=self.approx)
        x = nn.Dense(self.dim)(x)
        g = self.param('gamma', nn.initializers.constant(1e-6), (self.dim,))
        return s + g * x


def reps(step, x0):
    """Chain K dependent evaluations so XLA can't elide any."""
    def body(c, _):
        return step(c), None
    return jax.lax.scan(body, x0, None, length=K_REPS)[0]


def bench_block(name, x, approx, dw=True):
    blk = Block(C, approx, dw)
    p = blk.init(key, x)

    @jax.jit
    def fwdbwd(p, x):
        def one(xx):
            g = jax.grad(lambda xx: (blk.apply(p, xx) ** 2).mean())(xx)
            return xx + 1e-6 * g.astype(xx.dtype)
        return reps(one, x).mean()

    print(f'{name:44s} {timeit(fwdbwd, p, x):7.3f} ms')


bench_block('block f32 exact-gelu fwd+bwd(x)', x32, False)
bench_block('block f32 tanh-gelu fwd+bwd(x)', x32, True)
bench_block('block bf16 exact-gelu fwd+bwd(x)', x16, False)
bench_block('block f32 exact NO-dwconv fwd+bwd(x)', x32, False, dw=False)

# dwconv alone fwd
dwc = nn.Conv(C, (7, 7), padding=3, feature_group_count=C)
pdw = dwc.init(key, x32)


@jax.jit
def dw_f(p, x):
    return reps(lambda xx: dwc.apply(p, xx), x).mean()


print(f'{"dwconv7x7 fwd-only f32":44s} {timeit(dw_f, pdw, x32):7.3f} ms')
print(f'{"dwconv7x7 fwd-only bf16":44s} {timeit(dw_f, jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), pdw), x16):7.3f} ms')

# gelu alone at hidden width
xh = jax.random.normal(key, (B, H, W, 4 * C), jnp.float32)
for approx, nm in ((False, 'gelu exact'), (True, 'gelu tanh')):
    @jax.jit
    def g_fb(x, approx=approx):
        def one(xx):
            g = jax.grad(lambda v: nn.gelu(v, approximate=approx).mean())(xx)
            return xx + g
        return reps(one, x).mean()
    print(f'{nm + " fwd+bwd (8,96,160,384) f32":44s} {timeit(g_fb, xh):7.3f} ms')

# pointwise matmul pair (the MLP) alone
d1 = nn.Dense(4 * C); d2 = nn.Dense(C)
pmlp = {'d1': d1.init(key, x32), 'd2': d2.init(key, jnp.zeros((1, 4 * C)))}


@jax.jit
def mlp_fb(p, x):
    def one(xx):
        def f(xx):
            h = d1.apply(p['d1'], xx)
            return (d2.apply(p['d2'], h) ** 2).mean()
        return xx + jax.grad(f)(xx)
    return reps(one, x).mean()


print(f'{"MLP 96->384->96 fwd+bwd(x) f32":44s} {timeit(mlp_fb, pmlp, x32):7.3f} ms')
