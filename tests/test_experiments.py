"""Experiment driver tests: epoch discovery, registry dispatch, validate_to_csv sweep."""
import numpy as np

from speechless_tpu.configuration import Configuration, DataDirectories
from speechless_tpu.data import LibriSpeechCorpus, TrainingTestSplit
from speechless_tpu.experiments import (ExperimentRegistry, TrainedRun, available_epochs,
                                        validate_to_csv)
from speechless_tpu.system import Wav2Letter

from test_corpus import make_librispeech_tree


def make_config(tmp_path):
    corpus_root = tmp_path / "data" / "corpus" / "English"
    make_librispeech_tree(corpus_root / "mini", ["one two", "three four", "five"])

    def factory(corpus_directory):
        return LibriSpeechCorpus(base_directory=corpus_directory, corpus_name="mini",
                                 training_test_split=TrainingTestSplit.overfit(2))

    return Configuration(name="English", corpus_from_directory=factory,
                         directories=DataDirectories(tmp_path / "data"),
                         batch_size=2, training_batches_per_epoch=1)


class TestAvailableEpochs:
    def test_discovers_and_sorts(self, tmp_path):
        net = tmp_path / "run"
        net.mkdir()
        for epoch in (3, 1, 10):
            (net / "weights-epoch{}.npz".format(epoch)).write_bytes(b"")
        (net / "weights-epochX.npz").write_bytes(b"")
        (net / "other.npz").write_bytes(b"")
        assert available_epochs(net) == [1, 3, 10]


class TestValidateToCsv:
    def test_sweep_writes_rows(self, tmp_path):
        config = make_config(tmp_path)
        wav2letter = Wav2Letter(config.mel_frequency_count,
                                allowed_characters=config.allowed_characters)
        net_dir = config.directories.nets_base_directory / "sweeprun"
        wav2letter.save(net_dir, epoch=1)
        wav2letter.save(net_dir, epoch=2)
        csv_file = tmp_path / "validation.csv"
        validate_to_csv(config, "sweeprun", csv_file)
        lines = csv_file.read_text().strip().splitlines()
        assert lines[0].startswith("epoch,average_loss")
        assert len(lines) == 3
        assert lines[1].split(",")[0] == "1"
        assert lines[2].split(",")[0] == "2"


class TestRegistry:
    def test_dispatch_runs_logged_evaluation(self, tmp_path):
        config = make_config(tmp_path)
        Wav2Letter(config.mel_frequency_count,
                   allowed_characters=config.allowed_characters).save(
            config.directories.nets_base_directory / "regrun", epoch=4)

        registry = ExperimentRegistry(lambda: config)
        registry.add_evaluation(TrainedRun("regrun", 4))
        assert registry.names() == ["regrun-4"]
        registry.run(0)
        result_file = config.directories.test_results_directory / "regrun-4.txt"
        assert result_file.exists()
        assert "Average over" in result_file.read_text()
