"""Axon smoke of the CTF device generator (chain16 de-risk).

The old MTF synth proved complex elementwise mult on axon; the CTF
rewrite (82e2ce0) adds complex jnp.fft.fft/ifft and lax.complex
accumulations that have never run on the chip. One tiny program.
"""
import jax, jax.numpy as jnp
from sarssl_tpu.utils.jaxcache import enable_persistent_cache
enable_persistent_cache()
from sarssl_tpu.data import DeviceSynthConfig, synth_batch_device

cfg = DeviceSynthConfig(nsample=int(4.112 * 16000))  # chain16 pretrain shape
w, lab = synth_batch_device(jax.random.PRNGKey(0), 8, cfg)
s = float(w.std())  # fetch a scalar: the real sync on axon
print("CTF_AXON_SMOKE_OK std=%.5f tdoa0=%.6f t60_0=%.3f nonfinite=%d"
      % (s, float(lab["TDOA"][0]), float(lab["T60"][0]),
         int(jnp.sum(~jnp.isfinite(w)))))
