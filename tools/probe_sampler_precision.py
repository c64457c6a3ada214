import sys, pathlib, json, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
import bench
bench._enable_compile_cache()

program, obs = bench.build_program(instrument='AtLAST-50k', site='ALMA', duration=60.0, radius=0.5, speed=0.25, atmosphere='3d')
g = program.groups[0]
n_det, n_tc = len(program.offsets), len(program.t_coarse)
rng = np.random.default_rng(0)
stack = jnp.asarray(rng.standard_normal((len(g.heights), g.ny, g.nx)).astype(np.float32))
px = jnp.asarray(rng.uniform(-0.02, 0.02, (n_det, 1)).astype(np.float32) + np.zeros((1, n_tc), np.float32))
py = jnp.asarray(rng.uniform(-0.02, 0.02, (n_det, 1)).astype(np.float32) + np.zeros((1, n_tc), np.float32))
bs = jnp.zeros((n_tc,), jnp.float32)
t_rel = jnp.asarray(program.t_coarse.astype(np.float32))

from maria_tpu.atmosphere.sampling import _sample_group_windowed

def timed_aot(f, *a):
    lowered = jax.jit(f).lower(*a)
    comp = lowered.compile()
    ca = comp.cost_analysis()
    d = ca[0] if isinstance(ca, (list, tuple)) else ca
    float(np.asarray(comp(*a)).sum() if hasattr(comp(*a), 'sum') else comp(*a))
    ts = []
    for _ in range(3):
        s = time.perf_counter(); r = comp(*a); np.asarray(r).ravel()[:1]; ts.append(time.perf_counter()-s)
    return round(min(ts)*1e3,1), round(float(d.get('bytes accessed',0))/1e9,2), round(float(d.get('flops',0))/1e9,1)

out = {}
for name, kw in [('f32', dict(bf16=False)), ('bf16cast', dict(bf16=True))]:
    f = lambda s, px, py, b, t, kw=kw: jnp.sum(_sample_group_windowed(s, g, px, py, b, b, t, **kw))
    out[name] = timed_aot(f, stack, px, py, bs, t_rel)
# chunk sweep on f32
for chunk in (16, 64, 128, 256):
    f = lambda s, px, py, b, t, c=chunk: jnp.sum(_sample_group_windowed(s, g, px, py, b, b, t, chunk=c, bf16=False))
    out[f'f32_chunk{chunk}'] = timed_aot(f, stack, px, py, bs, t_rel)
print(json.dumps(out))
