import time, numpy as np, jax, jax.numpy as jnp
from csbsr_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from __graft_entry__ import _flagship_cfg
from csbsr_tpu.models import model_from_cfg
from csbsr_tpu.engine import phase_config_from_cfg, build_train_step, make_degrade_fn
from csbsr_tpu.engine.train_state import create_train_state, grad_group_ids

for B in (6, 16, 32):
    cfg = _flagship_cfg()
    cfg.SOLVER.BATCH_SIZE = B
    model = model_from_cfg(cfg)  # f32 params; compute dtype from cfg default f32
    pc = phase_config_from_cfg(cfg, 10000)
    rng = jax.random.PRNGKey(0)
    npr = np.random.RandomState(0)
    hr = jnp.asarray(npr.rand(B,224,224,3).astype(np.float32))
    seg = jnp.asarray((npr.rand(B,224,224,1)>0.9).astype(np.float32))
    lr, k = jax.jit(make_degrade_fn(cfg))(hr, rng)
    state = create_train_state(cfg, model, rng, {"hr":hr,"seg":seg,"lr":lr,"kernel":k}, pc)
    gids = grad_group_ids(state.params)
    step = jax.jit(build_train_step(cfg, model, pc, gids), donate_argnums=(0,))
    state = state.replace(step=jnp.asarray(50000, jnp.int32))  # joint phase
    batch = {"hr":hr, "seg":seg}
    t0=time.time()
    state, m = step(state, batch, rng); float(m["loss"])
    print(f"B={B} compile+1st: {time.time()-t0:.1f}s", flush=True)
    n=10; t0=time.time()
    for i in range(n):
        state, m = step(state, batch, jax.random.fold_in(rng,i))
    float(m["loss"])
    dt=time.time()-t0
    print(f"B={B}: {dt/n*1000:.0f} ms/step, {B*n/dt:.1f} img/s train", flush=True)
