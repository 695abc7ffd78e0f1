"""Shared staging helpers for the localhost dress rehearsals.

The reference trains on corpora fetched from openslr.org / the BAS Clarin server
(`/root/reference/speechless/english_corpus.py:292-329`,
`/root/reference/speechless/german_corpus.py:47-418`). Network egress is blocked in
this image, so the rehearsals serve REAL-LAYOUT archives (FLAC + `.trans.txt` trees
for LibriSpeech, `.par`/`_annot.json` / Voxforge-XML trees for German) from a
localhost ``http.server`` and point the fetch-URL override at it — the
`Configuration` entry points themselves run UNTOUCHED from fetch to WER. Audio is
the synthetic learnable corpus (`data/synthetic.py`) so training converges in
minutes instead of days.
"""
import http.server
import shutil
import tarfile
import threading
from functools import partial
from pathlib import Path


def stage_librispeech_archive(work: Path, corpus_name: str, utterances: int,
                              seed: int, difficulty: str = "standard",
                              speakers: int = 8, min_duration_s: float = 2.0,
                              max_duration_s: float = 5.0) -> Path:
    """Build ``<corpus_name>.tar.gz`` exactly as openslr ships it: a root
    ``LibriSpeech/`` directory containing ``<corpus_name>/<speaker>/<chapter>/``
    with FLAC audio and per-chapter ``.trans.txt`` transcripts (uppercase).

    Distinct ``seed``s give every archive distinct utterances AND distinct
    example ids (the synthetic chapter field hashes the generation signature), so
    a ComposedCorpus over several staged archives passes duplicate validation and
    test-clean text is genuinely held out from the training archives. Staging is
    idempotent per (name, count, seed, difficulty): the encoded archive is reused
    when the marker matches.
    """
    import numpy as np
    import scipy.io.wavfile as wavfile

    from speechless_tpu.data.synthetic import generate_corpus
    from speechless_tpu.features.flac_encoder import encode_flac

    serve_root = work / "serve"
    serve_root.mkdir(parents=True, exist_ok=True)
    archive = serve_root / (corpus_name + ".tar.gz")
    marker = serve_root / (corpus_name + ".staged")
    signature = str((corpus_name, utterances, seed, difficulty, speakers,
                     min_duration_s, max_duration_s, "v1"))
    if archive.is_file() and marker.is_file() and marker.read_text() == signature:
        return archive

    staging = work / "staging"
    source = generate_corpus(staging, corpus_name=corpus_name + "-src",
                             utterance_count=utterances, speaker_count=speakers,
                             min_duration_s=min_duration_s,
                             max_duration_s=max_duration_s, seed=seed,
                             difficulty=difficulty)
    tree = work / "tree" / corpus_name / "LibriSpeech" / corpus_name
    if tree.exists():
        shutil.rmtree(tree)
    for wav in sorted(source.rglob("*.wav")):
        chapter_dir = tree / wav.parent.relative_to(source / "all")
        chapter_dir.mkdir(parents=True, exist_ok=True)
        rate, samples = wavfile.read(str(wav))
        if samples.dtype != np.int16:
            samples = (np.clip(samples, -1.0, 1.0) * 32767).astype(np.int16)
        # Plain Python ints: the encoder's bit arithmetic overflows on numpy int16.
        encode_flac(chapter_dir / (wav.stem + ".flac"),
                    [samples.astype(int).tolist()], sample_rate=rate)
    for trans in sorted(source.rglob("*.trans.txt")):
        if not trans.read_text().strip():
            continue  # speakers beyond utterance_count get an empty trans file
        target = tree / trans.parent.relative_to(source / "all") / trans.name
        target.parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(trans, target)
    with tarfile.open(str(archive), "w:gz") as tar:
        tar.add(str(tree.parent), arcname="LibriSpeech")
    marker.write_text(signature)
    return archive


def _escape_quote_before(text: str) -> str:
    """Inverse of `UmlautDecoder.quote_before_umlaut` (most Clarin corpora)."""
    for char, escaped in (("ä", '\\"a'), ("ö", '\\"o'), ("ü", '\\"u'), ("ß", '\\"s')):
        text = text.replace(char, escaped)
    return text


def _escape_quote_after(text: str) -> str:
    """Inverse of `UmlautDecoder.quote_after_umlaut` (SC1, SC10)."""
    for char, escaped in (("ä", 'a"'), ("ö", 'o"'), ("ü", 'u"'), ("ß", 's"')):
        text = text.replace(char, escaped)
    return text


UMLAUT_ESCAPES = {"before": _escape_quote_before, "after": _escape_quote_after,
                  "none": lambda text: text}


def _german_sentences(count: int, seed: int, min_duration_s: float,
                      max_duration_s: float):
    """``count`` synthetic German sentences: ``(words, audio_per_word)`` pairs —
    per-word synthesis so Clarin positional ``_annot.json`` staging knows exact
    sample ranges."""
    import numpy as np

    from speechless_tpu.data.german import german_frequent_characters
    from speechless_tpu.data.synthetic import (DEFAULT_VOCABULARY,
                                               GERMAN_EXTRA_VOCABULARY,
                                               _markov_successors,
                                               sample_sentence,
                                               synthesize_utterance)

    vocabulary = [w for w in list(DEFAULT_VOCABULARY) + list(GERMAN_EXTRA_VOCABULARY)
                  if all(c in german_frequent_characters for c in w)]
    successors = _markov_successors(vocabulary, branching=3, seed=seed + 1)
    rand = np.random.RandomState(seed)
    seconds_per_word = 0.09 * (np.mean([len(w) for w in vocabulary]) + 1)
    sentences = []
    for _ in range(count):
        duration = min_duration_s + (max_duration_s - min_duration_s) * rand.rand()
        word_count = max(2, int(round(duration / seconds_per_word)))
        text = sample_sentence(rand, vocabulary, successors, word_count)
        words = text.split()
        audio = [synthesize_utterance(word, rand) for word in words]
        sentences.append((words, audio))
    return sentences


def _write_wav16(path: Path, audio) -> None:
    import numpy as np
    import scipy.io.wavfile as wavfile

    wavfile.write(str(path), 16000,
                  (np.clip(audio, -1.0, 1.0) * 32767).astype(np.int16))


def _annot_json(words_with_ranges) -> str:
    """EMU-style ``_annot.json``: ORT word items linked to MAU SEGMENT items carrying
    sample ranges (the layout `GermanClarinCorpus._extract_positional_label_from_json`
    parses; mirrors the real BAS EMU exports)."""
    import json as json_module

    items = [{"id": i + 1, "labels": [{"name": "ORT", "value": w}]}
             for i, (w, _) in enumerate(words_with_ranges)]
    segments = [{"id": 100 + i, "sampleStart": int(r[0]),
                 "sampleDur": int(r[1] - r[0] - 1),
                 "labels": [{"name": "MAU", "value": "phon"}]}
                for i, (_, r) in enumerate(words_with_ranges)]
    links = [{"fromID": i + 1, "toID": 100 + i}
             for i in range(len(words_with_ranges))]
    return json_module.dumps({"levels": [
        {"name": "ORT", "type": "ITEM", "items": items},
        {"name": "MAU", "type": "SEGMENT", "items": segments}], "links": links})


def stage_clarin_archive(work: Path, corpus_name: str, utterances: int, seed: int,
                         escape: str = "before", sessions: int = 6,
                         id_prefix: str = "", alc_pairs: bool = False,
                         positional_json: bool = False,
                         min_duration_s: float = 2.0,
                         max_duration_s: float = 4.0) -> Path:
    """Build ``<corpus_name>.tgz`` in the BAS Clarin layout `GermanClarinCorpus`
    fetches and parses: ``block0/ses<k>/<id>.{wav,par[,_annot.json]}`` (files at
    ``subdirectory_depth=2``), BAS-Partitur ORT tier lines with the corpus's umlaut
    escaping, optionally EMU ``_annot.json`` with MAU sample ranges (positional
    labels), optionally ALC ``_h_``/``_m_`` sibling pairs (the ``_m_`` file carries
    an empty ORT tier; the parser repairs it from the ``_h_`` sibling).
    """
    import numpy as np

    serve_root = work / "serve"
    serve_root.mkdir(parents=True, exist_ok=True)
    archive = serve_root / (corpus_name + ".tgz")
    marker = serve_root / (corpus_name + ".staged")
    signature = str((corpus_name, utterances, seed, escape, sessions, id_prefix,
                     alc_pairs, positional_json, min_duration_s, max_duration_s,
                     "v1"))
    if archive.is_file() and marker.is_file() and marker.read_text() == signature:
        return archive

    escape_fn = UMLAUT_ESCAPES[escape]
    tree = work / "tree" / corpus_name
    if tree.exists():
        shutil.rmtree(tree)
    sentences = _german_sentences(utterances, seed, min_duration_s, max_duration_s)
    pause = np.zeros(800, np.float32)  # 50 ms between words
    for index, (words, word_audio) in enumerate(sentences):
        session_dir = tree / "block0" / "ses{}".format(index % sessions)
        session_dir.mkdir(parents=True, exist_ok=True)
        if alc_pairs:
            stem = "{}{:03d}_h_{:02d}".format(id_prefix, index % sessions, index)
        else:
            stem = "{}s{}u{:04d}".format(id_prefix, index % sessions, index)
        parts, ranges, position = [], [], 0
        for word_samples in word_audio:
            parts += [word_samples, pause]
            ranges.append((position, position + len(word_samples)))
            position += len(word_samples) + len(pause)
        _write_wav16(session_dir / (stem + ".wav"), np.concatenate(parts))
        ort_lines = ["ORT:\t{}\t{}".format(i, escape_fn(w))
                     for i, w in enumerate(words)]
        (session_dir / (stem + ".par")).write_text(
            "LHD: Partitur 1.3\n" + "\n".join(ort_lines) + "\n", encoding="utf8")
        if positional_json:
            (session_dir / (stem + "_annot.json")).write_text(
                _annot_json(list(zip(words, ranges))), encoding="utf8")
        if alc_pairs:
            # The _m_ sibling: same recording, empty ORT tier (repaired from _h_).
            m_stem = stem.replace("_h_", "_m_")
            _write_wav16(session_dir / (m_stem + ".wav"), np.concatenate(parts))
            (session_dir / (m_stem + ".par")).write_text("LHD: Partitur 1.3\n",
                                                         encoding="utf8")
    with tarfile.open(str(archive), "w:gz") as tar:
        for child in sorted(tree.iterdir()):
            tar.add(str(child), arcname=child.name)
    marker.write_text(signature)
    return archive


def stage_voxforge_archive(work: Path, prompts: int, seed: int,
                           microphones=("_Yamaha", "_Realtek"),
                           train_share: float = 0.8,
                           min_duration_s: float = 2.0,
                           max_duration_s: float = 4.0) -> Path:
    """Build ``german-speechdata-package-v2.tar.gz`` in the Voxforge layout
    `GermanVoxforgeCorpus` fetches and parses: ``train|dev|test/<stem>.xml`` (one
    ``cleaned_sentence`` prompt) + one wav per microphone ending
    (``subdirectory_depth=1``; the ``test`` directory is the held-out split)."""
    import numpy as np

    corpus_name = "german-speechdata-package-v2"
    serve_root = work / "serve"
    serve_root.mkdir(parents=True, exist_ok=True)
    archive = serve_root / (corpus_name + ".tar.gz")
    marker = serve_root / (corpus_name + ".staged")
    signature = str((corpus_name, prompts, seed, tuple(microphones), train_share,
                     min_duration_s, max_duration_s, "v1"))
    if archive.is_file() and marker.is_file() and marker.read_text() == signature:
        return archive

    tree = work / "tree" / corpus_name
    if tree.exists():
        shutil.rmtree(tree)
    sentences = _german_sentences(prompts, seed, min_duration_s, max_duration_s)
    pause = np.zeros(800, np.float32)
    train_count = int(train_share * prompts)
    dev_count = (prompts - train_count) // 2
    for index, (words, word_audio) in enumerate(sentences):
        split = ("train" if index < train_count
                 else "dev" if index < train_count + dev_count else "test")
        split_dir = tree / split
        split_dir.mkdir(parents=True, exist_ok=True)
        stem = "2015-01-{:02d}-10-{:02d}-{:02d}".format(
            index // 3600 + 1, (index // 60) % 60, index % 60)
        (split_dir / (stem + ".xml")).write_text(
            "<recording><cleaned_sentence>{}</cleaned_sentence></recording>"
            .format(" ".join(words)), encoding="utf8")
        audio = np.concatenate([p for w in word_audio for p in (w, pause)])
        for microphone in microphones:
            _write_wav16(split_dir / (stem + microphone + ".wav"), audio)
    with tarfile.open(str(archive), "w:gz") as tar:
        for child in sorted(tree.iterdir()):
            tar.add(str(child), arcname=child.name)
    marker.write_text(signature)
    return archive


def serve_directory(directory: Path):
    """Serve ``directory`` on a localhost ephemeral port; returns ``(server, url)``.
    Call ``server.shutdown()`` when the fetches are done."""
    handler = partial(http.server.SimpleHTTPRequestHandler,
                      directory=str(directory))
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, "http://127.0.0.1:{}/".format(server.server_address[1])
