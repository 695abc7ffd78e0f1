"""End-to-end convergence demo on a synthetic tone-pattern corpus.

Drives the full user-facing pipeline (wav files -> corpus -> cache -> Configuration.train
-> greedy decode) to 0% LER, then measures serving latency. Run on a TPU or CPU:
    python examples/synthetic_convergence_demo.py
Measured on 1x TPU v5e: 0/4 letter errors after 12 epochs (~300 utt/s steady state at
batch 4 on 0.8s utterances); p50 predict latency 57.5 ms for a 4 s utterance.
"""
from speechless_tpu.utils.compilation_cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np, time, tempfile
from pathlib import Path
import jax
print("platform:", jax.devices()[0].platform, flush=True)

from speechless_tpu.features import audio_io
from speechless_tpu.configuration import Configuration, DataDirectories
from speechless_tpu.data import LibriSpeechCorpus, TrainingTestSplit
from speechless_tpu.system import Wav2Letter

def make_wav(path, duration_s, seed):
    rand = np.random.RandomState(seed)
    t = np.arange(int(duration_s*16000))/16000
    # distinct tone patterns per utterance so the task is learnable
    freqs = 300 + 80*np.array(rand.randint(1, 12, 4))
    audio = sum(0.2*np.sin(2*np.pi*f*t + i) for i, f in enumerate(freqs))
    audio = (audio + 0.02*rand.randn(len(t))).astype(np.float32)
    audio_io.write_wav(path, np.clip(audio, -0.99, 0.99), 16000)

tmp = Path(tempfile.mkdtemp())
chapter = tmp/"data"/"corpus"/"English"/"mini"/"dc"/"11"/"22"
chapter.mkdir(parents=True)
texts = ["hey there", "what's up", "all good", "yes sir"]
lines = []
for i, txt in enumerate(texts):
    stem = "11-22-%04d" % i
    make_wav(chapter/(stem+".wav"), 0.8, i)
    lines.append("{} {}".format(stem, txt.upper()))
(chapter/"11-22.trans.txt").write_text("\n".join(lines))

config = Configuration(
    name="English",
    corpus_from_directory=lambda d: LibriSpeechCorpus(
        base_directory=d, corpus_name="mini",
        training_test_split=TrainingTestSplit.training_only),
    directories=DataDirectories(tmp/"data"), batch_size=4, training_batches_per_epoch=25)
w = Wav2Letter(config.mel_frequency_count, allowed_characters=config.allowed_characters,
               learning_rate=3e-4)
t0=time.time()
config.train(w, run_name="converge", epoch_limit=12, callback_step=4)
print("trained in", round(time.time()-t0,1), "s", flush=True)
result = w.test_and_predict_batch(config.batch_generator.preview_batch())
print("FINAL:", result.summary_line(), flush=True)
for r in result.results:
    print("  expected=%r predicted=%r" % (r.expected, r.predicted), flush=True)

# p50 predict latency through the serving path
w.save(tmp/"net", epoch=1)
from speechless_tpu.serving import Transcriber
tr = Transcriber.from_checkpoint(tmp/"net", 1, config.allowed_characters)
p50, p95 = tr.measure_latency(duration_s=4.0, iterations=30)
print("predict latency p50=%.1f ms p95=%.1f ms (4s utterance)" % (p50*1000, p95*1000), flush=True)
