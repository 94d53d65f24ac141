import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
x = jnp.ones((256, 256))
print("health:", float(jax.jit(lambda a: (a @ a).sum())(x)))
