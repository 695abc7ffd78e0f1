"""The `Wav2Letter` system facade: the reference's public model API
(`/root/reference/speechless/net.py:117-607`) on top of the TPU-native stack.

Maps the reference surface onto the new design:

* three lazy Keras graphs (predictive/loss/decoding) -> one jitted train step, one jitted
  eval step (loss + log-probs in a single device call), and an on-device greedy decoder /
  host beam decoder with LM fusion;
* `fit_generator` + callbacks -> an explicit epoch loop with preview predictions, per-epoch
  ``weights-epoch{n}`` checkpoints (including optimizer state — the reference dropped Adam
  moments on resume), CSV scalar logs, and optional `jax.profiler` traces;
* h5 weight load + cross-charset transfer (`net.py:209-269`) -> pytree checkpoint load with
  output-layer character remap, layer freezing, and optional reinitialization;
* KenLM vocabulary-consistency check (`net.py:171-177`) preserved verbatim in behavior.
"""
import csv
import math
import time
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from collections import OrderedDict

from .data.batching import batch_from_spectrograms, pad_to_bucket
from .features.example import LabeledSpectrogram
from .models import wav2letter as w2l
from .ops.decode import beam_search_decode, greedy_decode
from .text.graphemes import AsgGraphemeCodec, CtcGraphemeCodec
from .text.metrics import (ExpectationsVsPredictions, ExpectationsVsPredictionsInBatches,
                           ExpectationsVsPredictionsInGroupedBatches, ExpectationVsPrediction)
from .train import checkpoint as ckpt
from .train.trainer import (Batch, TrainState, init_train_state, make_eval_step,
                            make_lr_schedule, make_multi_step, make_optimizer,
                            make_train_step)
from .utils.tools import log, mkdir, read_text, single

DEFAULT_BEAM_WIDTH = 100
KENLM_WEIGHT = 0.8
WORD_COUNT_WEIGHT = 0.0
VALID_WORD_COUNT_WEIGHT = 2.3


class Wav2Letter:
    """Speech-recognition system based on wav2letter (arXiv:1609.03193)."""

    class InputNames:
        """Kept for API parity with the reference's named Keras inputs (`net.py:120-124`)."""
        input_batch = "input_batch"
        label_batch = "label_batch"
        prediction_lengths = "prediction_lenghts"  # (sic — reference spelling)
        label_lengths = "label_lenghts"

    def __init__(self,
                 input_size_per_time_step: int,
                 allowed_characters: List[str],
                 use_raw_wave_input: bool = False,
                 activation: str = "relu",
                 output_activation: str = "softmax",
                 learning_rate: float = 1e-4,
                 lr_warmup_steps: int = 0,
                 lr_decay: Optional[str] = None,
                 lr_decay_steps: Optional[int] = None,
                 gradient_clip_norm: Optional[float] = None,
                 accumulate_gradient_steps: Optional[int] = None,
                 dropout: Optional[float] = None,
                 load_model_from_directory: Optional[Path] = None,
                 load_epoch: Optional[int] = None,
                 allowed_characters_for_loaded_model: Optional[List[str]] = None,
                 frozen_layer_count: int = 0,
                 reinitialize_trainable_loaded_layers: bool = False,
                 use_asg: bool = False,
                 asg_transition_probabilities: Optional[np.ndarray] = None,
                 asg_initial_probabilities: Optional[np.ndarray] = None,
                 train_asg_transitions: bool = False,
                 kenlm_directory: Optional[Path] = None,
                 beam_width: int = DEFAULT_BEAM_WIDTH,
                 lm_weight: float = KENLM_WEIGHT,
                 word_count_weight: float = WORD_COUNT_WEIGHT,
                 valid_word_count_weight: float = VALID_WORD_COUNT_WEIGHT,
                 compute_dtype: Any = None,
                 remat: bool = False,
                 mesh: Any = None,
                 spec_augment: Any = None,
                 seed: int = 0):
        if frozen_layer_count > 0 and load_model_from_directory is None:
            raise ValueError("Layers cannot be frozen if model is trained from scratch.")
        if use_asg and kenlm_directory is not None:
            raise ValueError("LM-fused beam decoding is CTC-only; ASG decodes greedily "
                             "(kenlm_directory would be silently ignored).")
        if train_asg_transitions and not use_asg:
            raise ValueError("train_asg_transitions requires use_asg=True.")
        if use_raw_wave_input and input_size_per_time_step != 1:
            raise ValueError("Raw-wave input feeds (samples, 1) waveforms; "
                             "input_size_per_time_step must be 1, got {}."
                             .format(input_size_per_time_step))
        if use_raw_wave_input and spec_augment:
            # SpecAugment masks mel bins; on a (samples, 1) waveform any frequency
            # mask would zero the entire signal.
            raise ValueError("spec_augment is a mel-feature augmentation and does not "
                             "apply to the raw-wave model family.")
        self.train_asg_transitions = use_asg and train_asg_transitions

        self.use_asg = use_asg
        self.grapheme_encoding = (AsgGraphemeCodec(allowed_characters) if use_asg
                                  else CtcGraphemeCodec(allowed_characters))
        if use_asg:
            from .ops.asg import (default_asg_initial_probabilities,
                                  default_asg_transition_probabilities)
            if asg_transition_probabilities is None:
                asg_transition_probabilities = default_asg_transition_probabilities(
                    self.grapheme_encoding.grapheme_set_size)
            if asg_initial_probabilities is None:
                asg_initial_probabilities = default_asg_initial_probabilities(
                    self.grapheme_encoding.grapheme_set_size)
        self.asg_transition_probabilities = asg_transition_probabilities
        self.asg_initial_probabilities = asg_initial_probabilities
        self.kenlm_directory = Path(kenlm_directory) if kenlm_directory else None
        self.beam_width = beam_width
        # Decoder-weight knobs; defaults are the reference's hardcoded KenLM-fork values
        # (`net.py:449-451`). Exposed as kwargs so eval sweeps can tune them per corpus.
        self.lm_weight = lm_weight
        self.word_count_weight = word_count_weight
        self.valid_word_count_weight = valid_word_count_weight
        # On-device SpecAugment (ops/specaugment.py) — beyond-reference training
        # regularization; True selects the default policy. Training only; eval and
        # decode paths never see augmented features.
        if spec_augment is True:
            from .ops.specaugment import SpecAugment
            spec_augment = SpecAugment()
        self.spec_augment = spec_augment
        self.frozen_layer_count = frozen_layer_count
        self.load_epoch = load_epoch
        self.input_size_per_time_step = input_size_per_time_step
        self.output_activation = output_activation

        if compute_dtype is None:
            # bf16 convs on accelerators (MXU native; params/logits/loss stay f32 —
            # `w2l.apply` upcasts its output), f32 on CPU for exact-parity tests.
            compute_dtype = (jnp.float32 if jax.default_backend() == "cpu"
                             else jnp.bfloat16)
        self.config = w2l.Wav2LetterConfig(
            input_size_per_time_step=input_size_per_time_step,
            grapheme_set_size=self.grapheme_encoding.grapheme_set_size,
            use_raw_wave_input=use_raw_wave_input,
            activation=activation,
            dropout=dropout,
            compute_dtype=compute_dtype,
            remat=remat)

        if self.kenlm_directory is not None:
            expected_characters = list(single(
                read_text(self.kenlm_directory / "vocabulary",
                          encoding="utf8").splitlines()).lower())
            if list(allowed_characters) != expected_characters:
                raise ValueError(
                    "Allowed characters {} differ from those expected by kenlm decoder: {}"
                    .format(allowed_characters, expected_characters))
            from .lm.ngram import load_language_model
            self.language_model = load_language_model(self.kenlm_directory)
        else:
            self.language_model = None

        trainable = w2l.trainable_mask(self.config, frozen_layer_count)
        if self.train_asg_transitions:
            # The criterion pseudo-layer (appended below) is always trainable — freezing
            # applies to acoustic-model layers only.
            trainable = trainable + [True]
        self.optimizer = make_optimizer(
            make_lr_schedule(learning_rate, warmup_steps=lr_warmup_steps,
                             decay=lr_decay, decay_steps=lr_decay_steps),
            trainable=trainable, gradient_clip_norm=gradient_clip_norm,
            accumulate_steps=accumulate_gradient_steps)

        rng = jax.random.PRNGKey(seed)
        params = None
        if load_model_from_directory is not None:
            if load_epoch is None:
                raise ValueError(
                    "load_epoch is required when load_model_from_directory is set "
                    "(pick one of experiments.available_epochs)")
            load_model_from_directory = Path(load_model_from_directory)
            if allowed_characters_for_loaded_model is None:
                params = ckpt.load_params(load_model_from_directory, load_epoch,
                                          config=self.config)
            else:
                params = ckpt.load_params_with_character_remap(
                    load_model_from_directory, load_epoch,
                    source_characters=allowed_characters_for_loaded_model,
                    target_characters=allowed_characters,
                    target_config=self.config,
                    loaded_first_layers_count=(frozen_layer_count
                                               if reinitialize_trainable_loaded_layers
                                               else None),
                    init_rng=rng)
        # Trainable ASG transition tables ride the params pytree as a trailing pseudo-layer
        # ("asg_transitions"/"asg_initials" log-score arrays): `w2l.apply` ignores it (it
        # zips with config.layers), checkpoints save/restore it generically, and Adam
        # updates it alongside the conv weights (arXiv:1609.03193 §2.3 — wav2letter learns
        # its transitions; the reference only ships the random init, `net.py:271-289`).
        if self.train_asg_transitions:
            if params is None:
                params = w2l.init_params(self.config, jax.random.split(rng)[0])
            if "asg_transitions" not in params[-1]:
                from .ops.asg import log_score_tables
                trans, init = log_score_tables(self.asg_transition_probabilities,
                                               self.asg_initial_probabilities)
                params = list(params) + [{"asg_transitions": jnp.asarray(trans),
                                          "asg_initials": jnp.asarray(init)}]
        elif params is not None and "asg_transitions" in params[-1]:
            # A fixed-table (or CTC) run loading a trainable-ASG checkpoint: drop the
            # criterion pseudo-layer so the params tree matches the optimizer mask.
            params = list(params)[:-1]
        # Mesh-sharded execution (DP over the `data` axis, Megatron-style TP on the wide
        # conv pair over `model`). Defaults to a global mesh under multi-host training —
        # single-device jit cannot run there (SURVEY.md §2c TPU-native plan).
        if mesh is None and jax.process_count() > 1:
            from .parallel.mesh import make_mesh
            mesh = make_mesh()
        self.mesh = mesh

        self.state = init_train_state(self.config, self.optimizer, rng, params=params)
        if self.mesh is not None:
            from .parallel import mesh as pmesh
            from .parallel.distributed import shard_params_global
            specs = pmesh.param_specs(self.config.layer_names)
            if self.train_asg_transitions:
                from jax.sharding import PartitionSpec
                specs = specs + [{"asg_transitions": PartitionSpec(),
                                  "asg_initials": PartitionSpec()}]
            sharded = shard_params_global(self.mesh,
                                          jax.tree.map(np.asarray, self.state.params),
                                          specs)
            self.state = self.state._replace(params=sharded,
                                             opt_state=self.optimizer.init(sharded))
        if (load_model_from_directory is not None and load_epoch is not None
                and allowed_characters_for_loaded_model is None):
            # Resume path only: transfer loads intentionally start optimizer state fresh
            # (and reading the Adam moments just to discard them would double load I/O).
            restored = ckpt.load_opt_state(load_model_from_directory, load_epoch,
                                           self.state.opt_state)
            if restored is not None:
                if self.mesh is not None:
                    # Re-place restored host values with the freshly-initialized
                    # opt_state's shardings (mu/nu mirror the param shardings). Scalar
                    # leaves (optax step counters) carry a SingleDeviceSharding with no
                    # spec — re-place those directly.
                    from .parallel.distributed import put_global

                    from jax.sharding import PartitionSpec

                    def replace(host, template):
                        # Scalar counters replicate over the mesh (a device-0-committed
                        # scalar would conflict with the mesh-context jit).
                        spec = getattr(template.sharding, "spec", PartitionSpec())
                        return put_global(self.mesh, spec, np.asarray(host))

                    restored = jax.tree.map(replace, restored, self.state.opt_state)
                self.state = self.state._replace(opt_state=restored)
            saved_step = ckpt.load_step(load_model_from_directory, load_epoch)
            if saved_step is not None:
                if self.mesh is not None:
                    from jax.sharding import PartitionSpec

                    from .parallel.distributed import put_global
                    step = put_global(self.mesh, PartitionSpec(),
                                      np.asarray(saved_step, np.int32))
                else:
                    step = jnp.asarray(saved_step, jnp.int32)
                self.state = self.state._replace(step=step)

        if use_asg:
            self._criterion = ("asg_trainable" if self.train_asg_transitions else "asg")
        elif jax.default_backend() == "tpu":
            # The Pallas CTC kernel beats the lax.scan recursion 2.9-8.5x across all
            # practical (T', U) shapes on TPU (BASELINE.md kernel-vs-scan table) with
            # bit-exact losses. Under a mesh the kernel runs per data shard via
            # shard_map (GSPMD cannot auto-partition a pallas_call).
            self._criterion = "ctc_pallas" if self.mesh is None else "ctc_pallas_sharded"
        else:
            self._criterion = "ctc"
        self._asg_tables = ((jnp.asarray(self.asg_transition_probabilities),
                             jnp.asarray(self.asg_initial_probabilities))
                            if use_asg else (None, None))
        self._train_step = None
        self._forward_jitted = None
        self._viterbi_jitted = None
        self._eval_step = make_eval_step(self.config, criterion=self._criterion,
                                         asg_transitions=self._asg_tables[0],
                                         asg_initials=self._asg_tables[1])

    # -- core model surface ----------------------------------------------

    @property
    def params(self) -> w2l.Params:
        return self.state.params

    @property
    def input_to_prediction_length_ratio(self) -> int:
        return self.config.input_to_prediction_length_ratio

    @property
    def _forward_fn(self):
        """Jitted log-softmax forward pass (eager layer-by-layer dispatch costs ~24ms per
        op round-trip on tunneled backends)."""
        if self._forward_jitted is None:
            config = self.config
            self._forward_jitted = jax.jit(
                lambda params, inputs: jax.nn.log_softmax(
                    w2l.apply(config, params, inputs), axis=-1))
        return self._forward_jitted

    def prediction_batch(self, input_batch: np.ndarray) -> np.ndarray:
        """Softmax grapheme probabilities for a padded spectrogram batch
        (the reference `predictive_net` output, `net.py:350-353`)."""
        return np.exp(np.asarray(self._forward_fn(self.state.params,
                                                  jnp.asarray(input_batch))))

    def _device_batch(self, batch: Batch, for_training: bool = True) -> Batch:
        """Transfer a host batch to the device(s). When convs compute in bf16, features
        ship as f16 (numpy has no bf16): halves host->device bytes — the dominant E2E
        cost on bandwidth-limited links — and `w2l.apply` upcasts to the compute dtype.

        With a mesh: training batches are this process's per-host shard and assemble to
        a global array over the data axis (`ShardedBatchGenerator` slices); eval batches
        shard over data when cleanly divisible on a single process, else replicate (the
        test-set tail page need not divide the data axis, and multi-host eval feeds the
        full batch on every host)."""
        inputs = batch.inputs
        if self.config.compute_dtype == jnp.bfloat16 and inputs.dtype == np.float32:
            inputs = inputs.astype(np.float16)
        batch = Batch(inputs, batch.input_lengths, batch.labels, batch.label_lengths)
        if self.mesh is None:
            return Batch(*map(jnp.asarray, batch))
        from .parallel import mesh as pmesh
        from .parallel.distributed import local_batch_to_global, put_global
        data_size = self.mesh.shape[pmesh.DATA_AXIS]
        if for_training or (jax.process_count() == 1
                            and batch.inputs.shape[0] % data_size == 0):
            return local_batch_to_global(self.mesh, batch)
        from jax.sharding import PartitionSpec
        return Batch(*(put_global(self.mesh, PartitionSpec(), np.asarray(field))
                       for field in batch))

    def _mesh_scope(self):
        import contextlib
        return jax.set_mesh(self.mesh) if self.mesh is not None \
            else contextlib.nullcontext()

    def _prepare_batch(self, labeled_spectrogram_batch: List[LabeledSpectrogram],
                       for_training: bool = True):
        batch, labels = batch_from_spectrograms(labeled_spectrogram_batch,
                                                self.grapheme_encoding,
                                                raw_wave=self.config.use_raw_wave_input)
        return self._device_batch(batch, for_training=for_training), labels

    # -- decoding / evaluation -------------------------------------------

    def _greedy_decode_tokens(self, log_probs, prediction_lengths) -> List[str]:
        """Shared greedy postprocessing: on-device decode, -1 -> blank, codec decode."""
        blank = self.grapheme_encoding.grapheme_set_size - 1
        tokens, counts = map(np.asarray, greedy_decode(log_probs, prediction_lengths,
                                                       blank))
        tokens = np.where(tokens < 0, blank, tokens)
        return self.grapheme_encoding.decode_grapheme_batch(tokens, list(counts),
                                                            merge_repeated=False)

    def _decode_tokens(self, log_probs, prediction_lengths) -> List[str]:
        if self.use_asg:
            # ASG: no blank; repetition graphemes decoded by the codec after repeat-merge.
            # With TRAINED transition tables the decode is transition-aware Viterbi
            # (ops/asg.py::asg_viterbi_decode) — per-frame log-softmax shifts every
            # path score equally, so ranking over the eval outputs is exact. The
            # fixed-table path keeps plain argmax (the reference's random tables carry
            # no signal for the path prior).
            if self.train_asg_transitions:
                from .ops.asg import asg_viterbi_decode
                if self._viterbi_jitted is None:
                    self._viterbi_jitted = jax.jit(asg_viterbi_decode)
                tables = self.state.params[-1]
                tokens = np.asarray(self._viterbi_jitted(
                    jnp.asarray(log_probs), jnp.asarray(prediction_lengths),
                    tables["asg_transitions"], tables["asg_initials"]))
            else:
                tokens = np.argmax(np.asarray(log_probs), axis=2)
            return self.grapheme_encoding.decode_grapheme_batch(
                tokens, list(np.asarray(prediction_lengths)), merge_repeated=True)
        blank = self.grapheme_encoding.grapheme_set_size - 1
        if self.kenlm_directory is not None:
            tokens, counts = beam_search_decode(
                np.asarray(log_probs), list(np.asarray(prediction_lengths)), blank=blank,
                beam_width=self.beam_width,
                alphabet=self.grapheme_encoding.allowed_characters,
                lm=self.language_model,
                lm_weight=self.lm_weight, word_count_weight=self.word_count_weight,
                valid_word_count_weight=self.valid_word_count_weight,
                # Production pruning (native path): classes below 1e-5 per frame cannot
                # influence a trained model's beam; verified output-identical in tests.
                prune_log_prob_floor=math.log(1e-5))
            # Dense -1 padding -> blank, then decode without re-merging (merging already
            # done), mirroring the reference's post-processing (`net.py:467-475`).
            tokens = np.where(tokens < 0, blank, tokens)
            return self.grapheme_encoding.decode_grapheme_batch(tokens, list(counts),
                                                                merge_repeated=False)
        return self._greedy_decode_tokens(log_probs, prediction_lengths)

    def test_and_predict_batch(self, labeled_spectrogram_batch: List[LabeledSpectrogram]
                               ) -> ExpectationsVsPredictions:
        batch, expected_labels = self._prepare_batch(labeled_spectrogram_batch,
                                                     for_training=False)
        with self._mesh_scope():
            log_probs, lengths, losses = self._eval_step(self.state.params, batch)
        predictions = self._decode_tokens(log_probs, lengths)
        return ExpectationsVsPredictions(
            [ExpectationVsPrediction(predicted=predicted, expected=expected, loss=float(loss))
             for predicted, expected, loss in zip(predictions, expected_labels,
                                                  np.asarray(losses))])

    def predict_batch_greedily(self, spectrograms: List[np.ndarray]) -> List[str]:
        batch = self._device_batch(
            pad_to_bucket(spectrograms, [""] * len(spectrograms), self.grapheme_encoding),
            for_training=False)
        with self._mesh_scope():
            log_probs = self._forward_fn(self.state.params, batch.inputs)
            lengths = w2l.prediction_lengths(self.config, batch.input_lengths)
        return self._greedy_decode_tokens(log_probs, lengths)

    def test_and_predict(self, labeled_spectrogram: LabeledSpectrogram
                         ) -> ExpectationVsPrediction:
        # No batch-of-1 workaround needed (the reference duplicated the example to dodge a
        # TF slicing bug, `net.py:491-495`).
        return self.test_and_predict_batch([labeled_spectrogram]).results[0]

    def predict(self, labeled_spectrogram: LabeledSpectrogram) -> str:
        return self.test_and_predict(labeled_spectrogram).predicted

    def test_and_predict_batch_with_log(self, index: int, batch: List[LabeledSpectrogram]
                                        ) -> ExpectationsVsPredictions:
        result = self.test_and_predict_batch(batch)
        log(str(result) + " (batch {})".format(index))
        return result

    def test_and_predict_batches(self, labeled_spectrogram_batches:
                                 Iterable[List[LabeledSpectrogram]]
                                 ) -> ExpectationsVsPredictionsInBatches:
        return ExpectationsVsPredictionsInBatches(
            [self.test_and_predict_batch_with_log(i, batch)
             for i, batch in enumerate(labeled_spectrogram_batches)])

    def test_and_predict_batches_with_log(self, corpus_name: str,
                                          batches: Iterable[List[LabeledSpectrogram]]
                                          ) -> ExpectationsVsPredictionsInBatches:
        result = self.test_and_predict_batches(batches)
        log("{}: {}".format(corpus_name, result))
        return result

    def test_and_predict_grouped_batches(self, grouped_batches: Dict[str, Iterable[
            List[LabeledSpectrogram]]]) -> ExpectationsVsPredictionsInGroupedBatches:
        return ExpectationsVsPredictionsInGroupedBatches(OrderedDict(
            (name, self.test_and_predict_batches_with_log(corpus_name=name, batches=batches))
            for name, batches in grouped_batches.items()))

    # -- training ---------------------------------------------------------

    @staticmethod
    def model_file_name(epoch: int) -> str:
        return ckpt.model_file_name(epoch)

    def train(self,
              labeled_spectrogram_batches: Iterable[List[LabeledSpectrogram]],
              preview_labeled_spectrogram_batch: List[LabeledSpectrogram],
              tensor_board_log_directory: Path,
              net_directory: Path,
              batches_per_epoch: int,
              epoch_limit: Optional[int] = None,
              save_step: int = 1,
              callback_step: int = 1,
              multi_step: int = 1,
              device_resident_examples: Optional[List[LabeledSpectrogram]] = None,
              batch_size: int = 64,
              profile_first_epoch_to: Optional[Path] = None) -> None:
        """Train until interrupted (or ``epoch_limit``): an explicit epoch loop replacing
        `fit_generator` (`net.py:541-576`). Per epoch: preview predictions, checkpoint
        (weights + optimizer state), scalar CSV log with utterances/sec.

        ``multi_step=k`` runs k optimizer updates per device dispatch via `lax.scan`
        (trainer.make_multi_step): the prefetcher stacks k prepared batches and one RPC
        executes them all, amortizing per-dispatch latency (~9 ms on tunneled backends).
        Must divide ``batches_per_epoch``; epoch-granular previews/checkpoints unchanged.

        ``device_resident_examples``: when given, the ENTIRE corpus is packed into HBM
        once (`data.device_dataset`) and each epoch runs as one device dispatch that
        samples its batches on device — zero steady-state host->device transfer
        (`labeled_spectrogram_batches`/``multi_step`` are ignored; batch sampling
        matches the host generator's uniform-without-replacement-within-batch
        semantics). ``batch_size`` applies to this mode only.

        Supports both CTC and ASG criteria (the reference raises NotImplementedError for
        ASG, `net.py:396-399`; here it is implemented — see ops/asg.py)."""
        if device_resident_examples is not None:
            self._train_device_resident(
                device_resident_examples, preview_labeled_spectrogram_batch,
                tensor_board_log_directory, net_directory, batches_per_epoch,
                epoch_limit=epoch_limit, save_step=save_step, callback_step=callback_step,
                batch_size=batch_size, profile_first_epoch_to=profile_first_epoch_to)
            return
        if multi_step < 1 or batches_per_epoch % multi_step != 0:
            raise ValueError("multi_step ({}) must be >= 1 and divide batches_per_epoch "
                             "({})".format(multi_step, batches_per_epoch))
        if self._train_step is None or self._train_step[0] != multi_step:
            make = make_train_step if multi_step == 1 else make_multi_step
            self._train_step = (multi_step,
                                make(self.config, self.optimizer, donate=True,
                                     criterion=self._criterion,
                                     asg_transitions=self._asg_tables[0],
                                     asg_initials=self._asg_tables[1],
                                     spec_augment=self.spec_augment))
        train_step = self._train_step[1]

        def print_preview_batch():
            log(self.test_and_predict_batch(preview_labeled_spectrogram_batch))

        print_preview_batch()

        mkdir(tensor_board_log_directory)
        from .data.batching import (Prefetcher, batch_from_spectrograms, chunked,
                                    stack_batches)
        from .utils.tensorboard import SummaryWriter
        tensorboard = SummaryWriter(tensor_board_log_directory)
        scalar_log = Path(tensor_board_log_directory) / "scalars.csv"
        new_log = not scalar_log.exists()
        # Host-side batch preparation (cache reads + padding + transfer) overlaps device
        # compute via a background prefetch thread.
        if multi_step == 1:
            batches = Prefetcher(iter(labeled_spectrogram_batches),
                                 prepare=self._prepare_batch, depth=2)
        else:
            def prepare_stacked(batch_group):
                prepared = [batch_from_spectrograms(
                                group, self.grapheme_encoding,
                                raw_wave=self.config.use_raw_wave_input)
                            for group in batch_group]
                stacked = stack_batches([host_batch for host_batch, _ in prepared])
                return (self._device_batch(stacked),
                        [label for _, labels in prepared for label in labels])

            batches = Prefetcher(chunked(iter(labeled_spectrogram_batches), multi_step),
                                 prepare=prepare_stacked, depth=2)
        initial_epoch = self.load_epoch if self.load_epoch is not None else 0
        epoch = initial_epoch
        from .train.preemption import GracefulShutdown
        # `tensorboard` joins the with-block so an interrupt ("train until interrupted" is a
        # documented workflow) still flushes and closes the event file.
        with batches, tensorboard, self._mesh_scope(), GracefulShutdown() as shutdown, \
                scalar_log.open("a", newline="") as scalar_file:
            writer = csv.writer(scalar_file)
            if new_log:
                writer.writerow(["epoch", "step", "loss", "utterances_per_second",
                                 "seconds_per_batch"])
            while epoch_limit is None or epoch < epoch_limit:
                if profile_first_epoch_to is not None and epoch == initial_epoch:
                    jax.profiler.start_trace(str(profile_first_epoch_to))
                epoch_start = time.time()
                losses = []
                utterances = 0
                for _ in range(batches_per_epoch // multi_step):
                    batch, _labels = next(batches)
                    self.state, metrics = train_step(self.state, batch)
                    losses.append(metrics["loss"])
                    # multi-step batches carry a leading steps axis: (k, B, T, F).
                    utterances += (batch.inputs.shape[0] * batch.inputs.shape[1]
                                   if batch.inputs.ndim == 4 else batch.inputs.shape[0])
                # One device->host fetch per epoch (per-step fetches would serialize on the
                # dispatch round-trip).
                mean_loss = float(jnp.mean(jnp.stack(losses)))
                elapsed = time.time() - epoch_start
                epoch += 1
                if profile_first_epoch_to is not None and epoch == initial_epoch + 1:
                    jax.profiler.stop_trace()
                log("Epoch {}: loss {:.2f}, {:.1f} utterances/s".format(
                    epoch, mean_loss, utterances / elapsed))
                writer.writerow([epoch, int(self.state.step), mean_loss,
                                 utterances / elapsed, elapsed / batches_per_epoch])
                scalar_file.flush()
                tensorboard.add_scalar("loss", mean_loss, epoch)
                tensorboard.add_scalar("utterances_per_second", utterances / elapsed, epoch)
                tensorboard.flush()
                if epoch % callback_step == 0:
                    print_preview_batch()
                if epoch % save_step == 0 and epoch > 0:
                    self.save(net_directory, epoch)
                if shutdown.requested:
                    if epoch % save_step != 0:
                        self.save(net_directory, epoch)
                    log("Preemption ({}): checkpointed epoch {}; exiting the training "
                        "loop.".format(shutdown.signal_name, epoch))
                    break

    def _train_device_resident(self,
                               examples: List[LabeledSpectrogram],
                               preview_labeled_spectrogram_batch: List[LabeledSpectrogram],
                               tensor_board_log_directory: Path,
                               net_directory: Path,
                               batches_per_epoch: int,
                               epoch_limit: Optional[int] = None,
                               save_step: int = 1,
                               callback_step: int = 1,
                               batch_size: int = 64,
                               profile_first_epoch_to: Optional[Path] = None) -> None:
        """Epoch loop over a device-resident corpus: one dispatch per epoch (see
        `data.device_dataset` / `trainer.make_device_epoch_step`)."""
        from .data.device_dataset import build_device_dataset
        from .train.trainer import make_device_epoch_step

        if batch_size > len(examples):
            raise ValueError("batch_size {} exceeds corpus size {}".format(
                batch_size, len(examples)))
        load_start = time.time()
        dataset, megabytes = build_device_dataset(
            examples, self.grapheme_encoding, compute_dtype=self.config.compute_dtype,
            mesh=self.mesh, raw_wave=self.config.use_raw_wave_input)
        log("Device-resident corpus: {} examples, {:.0f} MB in HBM (packed + transferred "
            "in {:.1f}s).".format(len(examples), megabytes, time.time() - load_start))
        epoch_fn = make_device_epoch_step(
            self.config, self.optimizer, batch_size=batch_size, steps=batches_per_epoch,
            donate=True, criterion=self._criterion, shard_batch=self.mesh is not None,
            asg_transitions=self._asg_tables[0], asg_initials=self._asg_tables[1],
            spec_augment=self.spec_augment)

        def print_preview_batch():
            log(self.test_and_predict_batch(preview_labeled_spectrogram_batch))

        print_preview_batch()
        mkdir(tensor_board_log_directory)
        from .utils.tensorboard import SummaryWriter
        tensorboard = SummaryWriter(tensor_board_log_directory)
        scalar_log = Path(tensor_board_log_directory) / "scalars.csv"
        new_log = not scalar_log.exists()
        initial_epoch = self.load_epoch if self.load_epoch is not None else 0
        epoch = initial_epoch
        # Deterministic per-epoch sampling streams (seed 42: the corpus-split convention).
        base_rng = jax.random.PRNGKey(42)
        from .train.preemption import GracefulShutdown
        with tensorboard, self._mesh_scope(), GracefulShutdown() as shutdown, \
                scalar_log.open("a", newline="") as scalar_file:
            writer = csv.writer(scalar_file)
            if new_log:
                writer.writerow(["epoch", "step", "loss", "utterances_per_second",
                                 "seconds_per_batch"])
            while epoch_limit is None or epoch < epoch_limit:
                if profile_first_epoch_to is not None and epoch == initial_epoch:
                    jax.profiler.start_trace(str(profile_first_epoch_to))
                epoch_start = time.time()
                self.state, metrics = epoch_fn(self.state, dataset,
                                               jax.random.fold_in(base_rng, epoch))
                mean_loss = float(metrics["loss"])  # value transfer = device sync
                elapsed = time.time() - epoch_start
                utterances = batches_per_epoch * batch_size
                epoch += 1
                if profile_first_epoch_to is not None and epoch == initial_epoch + 1:
                    jax.profiler.stop_trace()
                log("Epoch {}: loss {:.2f}, {:.1f} utterances/s (device-resident)".format(
                    epoch, mean_loss, utterances / elapsed))
                writer.writerow([epoch, int(self.state.step), mean_loss,
                                 utterances / elapsed, elapsed / batches_per_epoch])
                scalar_file.flush()
                tensorboard.add_scalar("loss", mean_loss, epoch)
                tensorboard.add_scalar("utterances_per_second", utterances / elapsed, epoch)
                tensorboard.flush()
                if epoch % callback_step == 0:
                    print_preview_batch()
                if epoch % save_step == 0 and epoch > 0:
                    self.save(net_directory, epoch)
                if shutdown.requested:
                    if epoch % save_step != 0:
                        self.save(net_directory, epoch)
                    log("Preemption ({}): checkpointed epoch {}; exiting the training "
                        "loop.".format(shutdown.signal_name, epoch))
                    break

    def save(self, net_directory: Path, epoch: int) -> Path:
        """Checkpoint weights + optimizer state. Mesh-sharded leaves are gathered to host
        (every process participates in the collective); only process 0 writes."""
        def to_host(x):
            if getattr(x, "is_fully_addressable", True):
                return np.asarray(x)
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))

        params = jax.tree.map(to_host, self.state.params)
        opt_state = jax.tree.map(to_host, self.state.opt_state)
        if jax.process_index() != 0:
            return Path(net_directory) / ckpt.model_file_name(epoch)
        return ckpt.save_checkpoint(net_directory, epoch, params, opt_state,
                                    step=int(self.state.step))
