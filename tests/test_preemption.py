"""Preemption-safe training (`train/preemption.py`): SIGTERM mid-run checkpoints at the
next epoch boundary and exits cleanly, so `train_or_resume` continues with full optimizer
state. The E2E test drives a REAL subprocess with a real signal."""
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

from speechless_tpu.train.preemption import GracefulShutdown

TESTS_DIR = Path(__file__).parent


class TestGracefulShutdown:
    def test_flag_set_without_dying(self):
        with GracefulShutdown() as shutdown:
            assert not shutdown.requested
            signal.raise_signal(signal.SIGTERM)
            assert shutdown.requested
            assert shutdown.signal_name == "SIGTERM"

    def test_second_signal_falls_through_to_previous_handler(self):
        hits = []
        previous = signal.signal(signal.SIGTERM, lambda s, f: hits.append(s))
        try:
            with GracefulShutdown() as shutdown:
                signal.raise_signal(signal.SIGTERM)
                assert shutdown.requested and not hits
                signal.raise_signal(signal.SIGTERM)  # force-quit path
                assert hits == [signal.SIGTERM]
        finally:
            signal.signal(signal.SIGTERM, previous)

    def test_handlers_restored_on_exit(self):
        before = signal.getsignal(signal.SIGTERM)
        with GracefulShutdown():
            assert signal.getsignal(signal.SIGTERM) != before
        assert signal.getsignal(signal.SIGTERM) == before


_TRAIN_SCRIPT = """
import sys
sys.path.insert(0, {repo_root!r})
sys.path.insert(0, {tests_dir!r})
import jax
jax.config.update("jax_platforms", "cpu")
from pathlib import Path
from test_corpus import make_librispeech_tree
from speechless_tpu.configuration import Configuration, DataDirectories
from speechless_tpu.data import LibriSpeechCorpus, TrainingTestSplit
from speechless_tpu.system import Wav2Letter

root = Path({root!r})
make_librispeech_tree(root / "corpus" / "English" / "mini",
                      ["hey there", "what's up", "all good", "yes"])
config = Configuration(
    name="English",
    corpus_from_directory=lambda d: LibriSpeechCorpus(
        base_directory=d, corpus_name="mini",
        training_test_split=TrainingTestSplit.overfit(3)),
    directories=DataDirectories(root), batch_size=2, training_batches_per_epoch=2)
wav2letter = Wav2Letter(config.mel_frequency_count, config.allowed_characters)
# epoch_limit=None: "train until interrupted" — only the preemption path can end this,
# and save_step=1000 means only the preemption path can write a checkpoint.
config.train(wav2letter, run_name="preempt", epoch_limit=None, save_step=1000,
             callback_step=1000)
print("CLEAN_EXIT", flush=True)
"""


@pytest.mark.slow
def test_sigterm_checkpoints_and_exits_cleanly(tmp_path):
    script = tmp_path / "train_until_killed.py"
    script.write_text(_TRAIN_SCRIPT.format(tests_dir=str(TESTS_DIR),
                                           repo_root=str(TESTS_DIR.parent),
                                           root=str(tmp_path / "data")))
    process = subprocess.Popen(
        [sys.executable, str(script)], stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    output = []
    try:
        deadline = time.time() + 600
        for line in process.stdout:
            output.append(line)
            if line.startswith("Epoch 2:"):
                process.send_signal(signal.SIGTERM)
                break
            assert time.time() < deadline, "".join(output)
        remaining, _ = process.communicate(timeout=600)
        output.append(remaining)
    finally:
        if process.poll() is None:
            process.kill()
    text = "".join(output)
    assert process.returncode == 0, text
    assert "CLEAN_EXIT" in text
    assert "Preemption (SIGTERM): checkpointed epoch" in text
    checkpoints = sorted((tmp_path / "data" / "nets" / "preempt").glob("weights-epoch*.npz"))
    assert checkpoints, text

    # The preempted run resumes from the preemption checkpoint and trains one more
    # epoch (epoch numbering + optimizer state continue; no fresh-start fallback).
    last_epoch = max(int(p.stem.split("epoch")[1]) for p in checkpoints)
    resume = subprocess.run(
        [sys.executable, "-c", """
import sys; sys.path.insert(0, {repo_root!r}); sys.path.insert(0, {tests_dir!r})
import jax; jax.config.update("jax_platforms", "cpu")
from pathlib import Path
from speechless_tpu.configuration import Configuration, DataDirectories
from speechless_tpu.data import LibriSpeechCorpus, TrainingTestSplit
root = Path({root!r})
config = Configuration(
    name="English",
    corpus_from_directory=lambda d: LibriSpeechCorpus(
        base_directory=d, corpus_name="mini",
        training_test_split=TrainingTestSplit.overfit(3)),
    directories=DataDirectories(root), batch_size=2, training_batches_per_epoch=2)
config.train_or_resume(run_name="preempt", epoch_limit={limit})
""".format(tests_dir=str(TESTS_DIR), repo_root=str(TESTS_DIR.parent),
           root=str(tmp_path / "data"), limit=last_epoch + 1)],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    resumed_text = resume.stdout + resume.stderr
    assert resume.returncode == 0, resumed_text
    assert "Resuming run preempt from epoch {}.".format(last_epoch) in resumed_text
    assert "Epoch {}:".format(last_epoch + 1) in resumed_text
