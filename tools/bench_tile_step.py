"""Single-tile (1024^2) denoiser-step timing + hlo_stats op table —
the cheap iteration loop for kernel work (compiles in ~4 min, correlates
with the integrated per-tile cost)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, time
from ucdir_tpu.models.dy3h import DY3h, compute_guide_maps
key = jax.random.PRNGKey(0)
dt = jnp.bfloat16
N = 8
S = 1024
m = DY3h(in_channel=6, out_channel=3, inner_channel=64,
         channel_mults=(1,2,4,8,8), attn_res=(16,), res_blocks=2,
         dropout=0.0, norm_groups=1, image_size=128, use_pallas=True)
xin = jax.random.normal(key, (1,S,S,6), dt)
nl = jnp.full((1,1), .5, dt)
gd = jax.random.normal(key, (1,S,S,3), dt)
v = jax.eval_shape(m.init, {'params': key, 'dropout': key}, xin, nl, gd)
v = jax.tree_util.tree_map(lambda a: jax.random.normal(key, a.shape, dt)*0.05, v)
def f(v, x, nl, g):
    maps = compute_guide_maps(m, v['params'], g)
    def step6(c, _):
        y = m.apply(v, c, nl, g, method='naiveforward', guide_maps=maps)
        return jnp.concatenate([c[..., :3], y.astype(dt)], -1), None
    return jax.lax.scan(step6, x, None, length=N)[0]
jf = jax.jit(f)
out = jf(v, xin, nl, gd); float(jnp.sum(out.astype(jnp.float32)))
t0 = time.perf_counter(); out = jf(v, xin, nl, gd); float(jnp.sum(out.astype(jnp.float32)))
print('tile fwd: %7.1f ms/step' % ((time.perf_counter()-t0)/N*1e3), flush=True)

import glob, json, shutil, collections
shutil.rmtree('/tmp/ucdir_trace', ignore_errors=True)
with jax.profiler.trace('/tmp/ucdir_trace'):
    out = jf(v, xin, nl, gd); float(jnp.sum(out.astype(jnp.float32)))
paths = glob.glob('/tmp/ucdir_trace/**/*.xplane.pb', recursive=True)
from xprof.convert import raw_to_tool_data as rtd
data, _ = rtd.xspace_to_tool_data(paths, 'hlo_stats', {})
obj = json.loads(data.decode('utf8'))
cols = [c['id'] for c in obj['cols']]
i_name = cols.index('hlo_op_name'); i_cat = cols.index('category')
i_self = cols.index('total_self_time'); i_occ = cols.index('occurrences')
i_expr = cols.index('hlo_op_expression')
rows = [(float(r['c'][i_self]['v'] or 0), r['c'][i_cat]['v'], r['c'][i_name]['v'], int(r['c'][i_occ]['v']), str(r['c'][i_expr]['v'])[:100]) for r in obj['rows']]
agg = collections.Counter()
for s, cat, *_ in rows: agg[cat] += s
tot = sum(agg.values())
print('=== categories (8 steps, %.0f ms total):' % (tot/1000))
for cat, us in agg.most_common(9):
    print('%9.0f us %5.1f%%  %s' % (us, 100*us/tot, cat))
rows.sort(key=lambda r: -r[0])
print('=== top ops (/8 for per-step):')
for s, cat, name, occ, expr in rows[:22]:
    print('%8.0f us x%-3d [%s] %s | %s' % (s, occ, cat, name[:30], expr))
