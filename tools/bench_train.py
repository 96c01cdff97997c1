"""Training-step throughput at the shipped SID config (256px crops)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from ucdir_tpu.config import parse
from ucdir_tpu.models.factory import define_G
from ucdir_tpu.schedule import make_schedule
from ucdir_tpu.train import make_optimizer, create_train_state, make_train_step

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
cfg = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   'ucdir_tpu', 'configs', 'sid.yaml')
opt = parse(cfg, phase='train', num_processes=1, make_dirs=False)
module = define_G(opt, remat=True)
sched = make_schedule(opt['model']['beta_schedule']['train'])
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, 256, 256, 3), jnp.float32)
batch = {'HR': x, 'SR': x * 0.5}
variables = jax.jit(module.init)({'params': key, 'dropout': key},
                                 batch, jnp.ones((B, 1)) * 0.5, x)
tx = make_optimizer(opt['train']['optimizer'])
state = create_train_state(variables['params'], tx, opt['train']['ema_scheduler'])
import jax.numpy as _jnp
dtype = _jnp.bfloat16 if '--bf16' in sys.argv else None
step = make_train_step(module, sched, compute_dtype=dtype)
t0 = time.perf_counter()
state, m = step(state, batch, key)
float(m['l_pix'])
print('compile+first: %.1fs' % (time.perf_counter() - t0), flush=True)
N = 5
t0 = time.perf_counter()
for i in range(N):
    state, m = step(state, batch, jax.random.fold_in(key, i))
float(m['l_pix'])
dt = (time.perf_counter() - t0) / N
print('train step B=%d 256px: %.3f s  (%.1f imgs/s/chip)' % (B, dt, B / dt),
      flush=True)
