"""Long-form training throughput (32.8 s utterances, T'=4096 mel frames): the regime
where the Pallas CTC kernel matters most (BASELINE.md kernel-vs-scan table).

    python examples/bench_longform.py
"""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from speechless_tpu.utils.compilation_cache import enable_compilation_cache
enable_compilation_cache()
import jax, numpy as np, jax.numpy as jnp
from speechless_tpu.models import wav2letter as w2l
from speechless_tpu.text.charsets import english_frequent_characters
from speechless_tpu.train.trainer import (WavBatch, init_train_state,
                                          make_multi_wav_step, make_optimizer)

B, SECONDS, STEPS, CALLS = 16, 32.768, 5, 3   # 4096 mel frames: long-form regime
print("platform:", jax.devices()[0].platform, flush=True)
config = w2l.Wav2LetterConfig(input_size_per_time_step=128,
                              grapheme_set_size=len(english_frequent_characters) + 1,
                              compute_dtype=jnp.bfloat16)
optimizer = make_optimizer(1e-4)
state = init_train_state(config, optimizer, jax.random.PRNGKey(0))
rng = np.random.RandomState(0)
samples = int(SECONDS * 16000)
U = 768
batch = WavBatch(
    wavs=jnp.asarray(np.broadcast_to(
        rng.randn(1, B, samples).astype(np.float32) * 0.1, (STEPS, B, samples))),
    wav_lengths=jnp.full((STEPS, B), samples, jnp.int32),
    labels=jnp.asarray(np.broadcast_to(
        rng.randint(0, config.grapheme_set_size - 1, (1, B, U)).astype(np.int32),
        (STEPS, B, U))),
    label_lengths=jnp.full((STEPS, B), U, jnp.int32))
for criterion in ("ctc_pallas", "ctc"):
    step = make_multi_wav_step(config, optimizer, donate=False, criterion=criterion)
    s = state
    s, m = step(s, batch); float(m["loss"])
    t0 = time.time()
    for _ in range(CALLS):
        s, m = step(s, batch)
    final = float(m["loss"]); elapsed = time.time() - t0
    assert np.isfinite(final)
    rate = B * STEPS * CALLS / elapsed
    print("long-form 32.8s x B=16 ({:10s}): {:7.1f} utt/s/chip = {:5.1f} min audio/s".format(
        criterion, rate, rate * SECONDS / 60), flush=True)
