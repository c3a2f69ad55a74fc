"""Does the axon (remote TPU) backend hit the persistent XLA executable
cache across processes? Compiles a distinctive heavy program with cache
logging; run twice in fresh processes and compare compile walls."""
import sys; sys.path.insert(0, "/root/repo")
import os, time, logging
os.environ["MGBTPU_NO_X64"] = "1"
logging.basicConfig(level=logging.DEBUG)
for m in ("jax._src.compilation_cache", "jax._src.compiler"):
    logging.getLogger(m).setLevel(logging.DEBUG)
import jax
jax.config.update("jax_explain_cache_misses", True)
from mgbtpu._config import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from jax import lax
import numpy as np

salt = int(os.environ.get("CACHEDIAG_SALT", "1"))
@jax.jit
def heavy(x):
    def body(i, c):
        a, b = c
        a = jnp.tanh(a @ b + float(salt) * 1e-9)
        b = b + 1e-6 * (a * a) @ b
        return (a, b)
    return lax.fori_loop(0, 64, body, (x, x + 1.0))

x = jnp.ones((640, 640), jnp.float32)
t0 = time.time(); r = heavy(x); jax.block_until_ready(r)
print(f"CACHEDIAG compile+run: {time.time()-t0:.2f}s backend={jax.default_backend()}", flush=True)
