import os, time
os.environ["STARK_TPU_TRACE"] = "1"
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_stark"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from stark_tpu.fields.field import BN254_FR as spec
from stark_tpu.r1cs.synth import squaring_chain
from stark_tpu.r1cs.reader import read_r1cs  # noqa
from stark_tpu.protocol import runner
from stark_tpu.r1cs import reader

n = int(os.environ.get("N", 10000))
r1cs, wb = squaring_chain(n)
t0 = time.time()
proof = runner.prove_with_witness(r1cs, wb)
print("prove wall (incl host+FS+FRI): %.1f s" % (time.time() - t0))
t0 = time.time()
ok = runner.verify_with_witness(r1cs, [wb[0], wb[1]], proof)
print("verify wall: %.1f s ok=%s" % (time.time() - t0, ok))
