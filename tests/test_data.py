"""Data pipeline tests: tokenization, collate static shapes, loaders,
synthetic + jsonl datasets, metrics engine."""

import json
import os

import numpy as np
import pytest

from bpx.config import DataConfig, ModelConfig, BertConfig, get_preset
from bpx.data.collate import collate
from bpx.data.loaders import BatchIterator, get_data_loaders, \
    get_labels_and_frequencies
from bpx.data.synthetic import SyntheticDataset
from bpx.data.tokenization import (HashTokenizer, WordPieceTokenizer,
                                   build_tokenizer)
from bpx.data.vocab import Vocab
from bpx.train.metrics import compute_metrics, tuning_metric, weighted_acc


# ---------------------------------------------------------------------------
# tokenization
# ---------------------------------------------------------------------------

def _mini_vocab():
    v = Vocab(emptyInit=True)
    v.itos = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
              "the", "cat", "sat", "un", "##aff", "##able", "##s", ",", "."]
    v.stoi = {w: i for i, w in enumerate(v.itos)}
    v.vocab_sz = len(v.itos)
    return v


def test_wordpiece_greedy_longest_match():
    tok = WordPieceTokenizer(_mini_vocab())
    assert tok.tokenize("the cats sat") == ["the", "cat", "##s", "sat"]
    assert tok.tokenize("unaffable") == ["un", "##aff", "##able"]
    assert tok.tokenize("THE Cat.") == ["the", "cat", "."]
    assert tok.tokenize("zzz") == ["[UNK]"]


def test_wordpiece_matches_hf_on_real_text():
    """Cross-check against HF's WordPiece with the same tiny vocab."""
    transformers = pytest.importorskip("transformers")
    v = _mini_vocab()
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("\n".join(v.itos))
        path = f.name
    hf = transformers.BertTokenizer(path, do_lower_case=True)
    ours = WordPieceTokenizer(v)
    for text in ["The cats sat, unaffable.", "un cat the", "??? unaff"]:
        assert ours.tokenize(text) == hf.tokenize(text), text
    os.unlink(path)


def test_encode_cls_and_truncation():
    tok = WordPieceTokenizer(_mini_vocab())
    ids = tok.encode("the cat sat the cat sat", max_len=4)
    assert len(ids) == 4 and ids[0] == 2     # [CLS]


def test_hash_tokenizer_deterministic():
    tok = HashTokenizer(100)
    a = tok.encode("hello world", 10)
    b = tok.encode("hello world", 10)
    assert a == b and a[0] == tok.cls_id and all(i < 100 for i in a)


# ---------------------------------------------------------------------------
# collate + loaders
# ---------------------------------------------------------------------------

def _cfgs():
    exp = get_preset("synthetic-tiny")
    return exp.data, exp.model


def test_collate_static_shapes():
    dcfg, mcfg = _cfgs()
    ds = SyntheticDataset(dcfg, mcfg, length=5)
    batch = collate([ds[i] for i in range(5)], dcfg, mcfg)
    assert batch["txt"].shape == (5, dcfg.max_seq_len)
    assert batch["mask"].shape == (5, dcfg.max_seq_len)
    assert batch["video"].shape == (5, dcfg.video_len, mcfg.orig_d_v)
    assert batch["audio"].shape == (5, dcfg.audio_raw_len, mcfg.orig_d_a)
    assert batch["poster"].shape == (5, mcfg.orig_d_p)
    assert batch["target"].shape == (5, mcfg.n_classes)
    # mask marks real tokens only
    assert (batch["mask"].sum(1) >= 1).all()
    assert (batch["txt"][batch["mask"] == 0] == 0).all()


def test_batch_iterator_shuffle_and_partial():
    dcfg, mcfg = _cfgs()
    ds = SyntheticDataset(dcfg, mcfg, length=19)
    it = BatchIterator(ds, dcfg, mcfg, batch_size=8, shuffle=True,
                       drop_last=False, prefetch=0)
    batches = list(it)
    assert len(batches) == 3
    assert "valid" in batches[-1] and batches[-1]["valid"].sum() == 3
    assert batches[-1]["txt"].shape[0] == 8    # padded to static size
    it2 = BatchIterator(ds, dcfg, mcfg, batch_size=8, shuffle=True,
                        drop_last=True, prefetch=0)
    assert len(list(it2)) == 2


def test_prefetch_thread_equals_sync():
    dcfg, mcfg = _cfgs()
    ds = SyntheticDataset(dcfg, mcfg, length=16)
    sync = list(BatchIterator(ds, dcfg, mcfg, 8, prefetch=0))
    pre = list(BatchIterator(ds, dcfg, mcfg, 8, prefetch=2))
    for a, b in zip(sync, pre):
        np.testing.assert_array_equal(a["txt"], b["txt"])
        np.testing.assert_array_equal(a["audio"], b["audio"])


def test_synthetic_loaders_and_meta():
    dcfg, mcfg = _cfgs()
    train, val, test, meta = get_data_loaders(dcfg, mcfg, seed=0)
    assert meta.n_classes == mcfg.n_classes
    assert meta.train_data_len == dcfg.synthetic_len
    b = next(iter(train))
    assert b["txt"].shape[0] == dcfg.batch_sz


def test_jsonl_dataset_moviescope_layout(tmp_path):
    """End-to-end jsonl + pickled features in the reference's moviescope
    layout (ref: dataset.py:94-104,150-155)."""
    import pickle
    task_dir = tmp_path / "moviescope"
    task_dir.mkdir()
    for sub in ["200F_VGG16", "PosterFeatures", "Melspectrogram"]:
        (task_dir / sub).mkdir()
    rng = np.random.RandomState(0)
    records = []
    for sid in ["1", "2", "3"]:
        records.append({"id": sid, "synopsis": f"movie {sid} plot",
                        "label": ["Drama"] if sid != "2" else ["Drama", "Action"]})
        with open(task_dir / "200F_VGG16" / f"{sid}.p", "wb") as f:
            pickle.dump(rng.randn(1, 16, 48).astype(np.float32), f)
        with open(task_dir / "PosterFeatures" / f"{sid}.p", "wb") as f:
            pickle.dump(rng.randn(1, 40).astype(np.float32), f)
        with open(task_dir / "Melspectrogram" / f"{sid}.p", "wb") as f:
            pickle.dump(rng.randn(96, 200).astype(np.float32), f)
    for split in ["train", "dev", "test"]:
        with open(task_dir / f"{split}.jsonl", "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")

    exp = get_preset("synthetic-tiny")
    import dataclasses
    dcfg = dataclasses.replace(exp.data, task="moviescope",
                               data_path=str(tmp_path), batch_sz=2,
                               audio_raw_len=200, video_len=16)
    mcfg = exp.model.replace(orig_d_a=96, orig_d_v=48, orig_d_p=40)
    train, val, test, meta = get_data_loaders(dcfg, mcfg, seed=0)
    assert set(meta.labels) == {"Drama", "Action"}
    assert meta.label_freqs["Drama"] == 3
    b = next(iter(train))
    assert b["video"].shape == (2, 16, 48)
    assert b["audio"].shape == (2, 200, 96)   # (96, T) pickles -> time-major
    assert b["poster"].shape == (2, 40)
    assert b["target"].shape == (2, 2)


def test_precollated_cache_matches_direct_path(tmp_path):
    """The precollated memmap store (bpx.data.cache) must reproduce the
    direct JsonlDataset -> collate batches bit-for-bit, across full and
    wrap-padded partial batches, and must persist (second loader build
    reuses the cache dir instead of rebuilding)."""
    import dataclasses
    import pickle
    task_dir = tmp_path / "moviescope"
    task_dir.mkdir()
    for sub in ["200F_VGG16", "PosterFeatures", "Melspectrogram"]:
        (task_dir / sub).mkdir()
    rng = np.random.RandomState(1)
    records = []
    for sid in ["1", "2", "3", "4", "5"]:
        records.append({"id": sid, "synopsis": f"movie {sid} plot words",
                        "label": ["Drama"] if sid != "2"
                        else ["Drama", "Action"]})
        with open(task_dir / "200F_VGG16" / f"{sid}.p", "wb") as f:
            pickle.dump(rng.randn(1, 16, 48).astype(np.float32), f)
        with open(task_dir / "PosterFeatures" / f"{sid}.p", "wb") as f:
            pickle.dump(rng.randn(1, 40).astype(np.float32), f)
        with open(task_dir / "Melspectrogram" / f"{sid}.p", "wb") as f:
            pickle.dump(rng.randn(96, 128).astype(np.float32), f)
    for split in ["train", "dev", "test"]:
        with open(task_dir / f"{split}.jsonl", "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")

    exp = get_preset("synthetic-tiny")
    base = dataclasses.replace(exp.data, task="moviescope",
                               data_path=str(tmp_path), batch_sz=2,
                               audio_raw_len=128, video_len=16)
    mcfg = exp.model.replace(orig_d_a=96, orig_d_v=48, orig_d_p=40)

    loaders = {}
    for cache in (False, True):
        dcfg = dataclasses.replace(base, feature_cache=cache)
        train, _, _, _ = get_data_loaders(dcfg, mcfg, seed=0)
        loaders[cache] = train
    assert loaders[True].store is not None
    assert loaders[False].store is None
    for b_direct, b_cached in zip(iter(loaders[False]),
                                  iter(loaders[True])):
        assert set(b_direct) == set(b_cached)
        for k in b_direct:
            np.testing.assert_array_equal(b_direct[k], b_cached[k], err_msg=k)

    # second build reuses the on-disk cache (same digest dir)
    cache_dirs = list((task_dir / ".bpx_cache").iterdir())
    dcfg = dataclasses.replace(base, feature_cache=True)
    train2, _, _, _ = get_data_loaders(dcfg, mcfg, seed=0)
    assert train2.store is not None
    assert sorted((task_dir / ".bpx_cache").iterdir()) == sorted(cache_dirs)


def test_labels_and_frequencies(tmp_path):
    p = tmp_path / "train.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"label": ["a", "b"]}) + "\n")
        f.write(json.dumps({"label": ["a"]}) + "\n")
    labels, freqs = get_labels_and_frequencies(str(p))
    assert set(labels) == {"a", "b"} and freqs["a"] == 2


# ---------------------------------------------------------------------------
# metrics engine (ref: train.py:138-280)
# ---------------------------------------------------------------------------

def test_weighted_acc_balanced():
    preds = np.array([1, 1, 0, 0])
    truth = np.array([1, 0, 1, 0])
    wacc, f1 = weighted_acc(preds, truth)
    assert abs(wacc - 0.5) < 1e-9


def test_moviescope_metrics_keys(rng):
    logits = rng.randn(20, 4).astype(np.float32)
    targets = (rng.rand(20, 4) > 0.5).astype(np.float32)
    m = compute_metrics("moviescope", "multilabel", logits, targets)
    for k in ["macro_f1", "micro_f1", "auc_pr_macro", "auc_pr_micro",
              "auc_pr_samples"]:
        assert k in m
    assert tuning_metric("moviescope", "multilabel", m) == m["auc_pr_micro"]


def test_mosei_metrics_keys(rng):
    logits = rng.randn(30, 6).astype(np.float32)
    targets = (rng.rand(30, 6) > 0.5).astype(np.float32)
    m = compute_metrics("cmu-mosei", "multilabel", logits, targets)
    assert "f1_emo1" in m and "wacc_emos" in m and "auc_pr_micro" in m


def test_mosi_regression_metrics(rng):
    logits = rng.randn(40, 1).astype(np.float32)
    targets = rng.uniform(-3, 3, 40).astype(np.float32)
    m = compute_metrics("cmu-mosi", "classification", logits, targets)
    for k in ["mae", "corr", "accuracy_7", "weighted_f1", "weight_f1"]:
        assert k in m
    assert m["weight_f1"] == m["mae"]
    assert tuning_metric("cmu-mosi", "classification", m) == m["mae"]


def test_jsonl_dataset_mmimdb_layout(tmp_path):
    """MM-IMDb layout: glove pickles as video, hdf5 vgg_features via
    indices.pkl as poster, BoW pickles in the audio slot
    (ref: dataset.py:106-118,181-185)."""
    import pickle
    import h5py
    task_dir = tmp_path / "mmimdb"
    task_dir.mkdir()
    (task_dir / "glove").mkdir()
    (task_dir / "BoW").mkdir()
    rng = np.random.RandomState(0)
    ids = ["10", "11"]
    with h5py.File(task_dir / "multimodal_imdb.hdf5", "w") as f:
        f.create_dataset("vgg_features",
                         data=rng.randn(2, 40).astype(np.float32))
    with open(task_dir / "indices.pkl", "wb") as f:
        pickle.dump({"10": 0, "11": 1}, f)
    records = []
    for sid in ids:
        records.append({"id": sid, "synopsis": f"plot {sid}",
                        "label": ["Drama"]})
        with open(task_dir / "glove" / f"{sid}.p", "wb") as f:
            pickle.dump({"glove": rng.randn(1, 20, 300).astype(np.float32)}, f)
        with open(task_dir / "BoW" / f"{sid}.p", "wb") as f:
            pickle.dump({"bow": rng.randn(50).astype(np.float32)}, f)
    for split in ["train", "dev", "test"]:
        with open(task_dir / f"{split}.jsonl", "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")

    exp = get_preset("synthetic-tiny")
    import dataclasses
    dcfg = dataclasses.replace(exp.data, task="mmimdb",
                               data_path=str(tmp_path), batch_sz=2,
                               audio_raw_len=50, video_len=20)
    mcfg = exp.model.replace(orig_d_a=1, orig_d_v=300, orig_d_p=40,
                             use_audio_encoder=False)
    train, _, _, meta = get_data_loaders(dcfg, mcfg, seed=0)
    b = next(iter(train))
    assert b["video"].shape == (2, 20, 300)
    assert b["audio"].shape == (2, 50, 1)    # BoW rides the audio slot
    assert b["poster"].shape == (2, 40)


def test_jsonl_dataset_mosei_layout(tmp_path):
    """CMU-MOSEI layout: Vision/{split}/{id}.p and Audio/{split}/{id}.p torch
    pickles (ref: dataset.py:125-135,160-170)."""
    import torch
    task_dir = tmp_path / "cmu-mosei"
    for sub in ["Vision/train", "Audio/train"]:
        (task_dir / sub).mkdir(parents=True)
    rng = np.random.RandomState(0)
    records = []
    for sid in ["a", "b"]:
        records.append({"id": sid, "task": "train",
                        "synopsis": f"utterance {sid}", "label": ["happy"]})
        with open(task_dir / "Vision" / "train" / f"{sid}.p", "wb") as f:
            torch.save(torch.randn(30, 35), f)
        with open(task_dir / "Audio" / "train" / f"{sid}.p", "wb") as f:
            torch.save(torch.randn(30, 74), f)
    for split in ["train", "dev", "test"]:
        with open(task_dir / f"{split}.jsonl", "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")

    exp = get_preset("synthetic-tiny")
    import dataclasses
    dcfg = dataclasses.replace(exp.data, task="cmu-mosei",
                               data_path=str(tmp_path), batch_sz=2,
                               audio_raw_len=30, video_len=30)
    mcfg = exp.model.replace(orig_d_a=74, orig_d_v=35,
                             use_audio_encoder=False, use_poster=False,
                             model="mmtrvat")
    train, _, _, meta = get_data_loaders(dcfg, mcfg, seed=0)
    b = next(iter(train))
    assert b["video"].shape == (2, 30, 35)
    assert b["audio"].shape == (2, 30, 74)
    assert "poster" not in b


def test_jsonl_dataset_counseling_layout(tmp_path):
    """Counseling layout: glove/{id}.p dict pickles as video and
    fasttext/{id}.p dict pickles as audio, both stored with a leading
    singleton axis (ref: dataset.py:120-124,187-190)."""
    import pickle
    task_dir = tmp_path / "counseling"
    (task_dir / "glove").mkdir(parents=True)
    (task_dir / "fasttext").mkdir()
    rng = np.random.RandomState(0)
    records = []
    for sid in ["c1", "c2"]:
        records.append({"id": sid, "synopsis": f"session {sid}",
                        "label": "good"})
        with open(task_dir / "glove" / f"{sid}.p", "wb") as f:
            pickle.dump({"glove": rng.randn(1, 24, 300).astype(np.float32)}, f)
        with open(task_dir / "fasttext" / f"{sid}.p", "wb") as f:
            pickle.dump({"fastText": rng.randn(1, 24, 100).astype(np.float32)},
                        f)
    for split in ["train", "dev", "test"]:
        with open(task_dir / f"{split}.jsonl", "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")

    exp = get_preset("synthetic-tiny")
    import dataclasses
    dcfg = dataclasses.replace(exp.data, task="counseling",
                               task_type="classification",
                               data_path=str(tmp_path), batch_sz=2,
                               audio_raw_len=24, video_len=24)
    mcfg = exp.model.replace(orig_d_v=300, orig_d_a=100, n_classes=1,
                             use_audio_encoder=False, use_poster=False,
                             model="mmtrvat")
    train, _, _, meta = get_data_loaders(dcfg, mcfg, seed=0)
    b = next(iter(train))
    assert b["video"].shape == (2, 24, 300)
    assert b["audio"].shape == (2, 24, 100)
    assert "poster" not in b


def test_jsonl_dataset_mosi_table_layout(tmp_path):
    """CMU-MOSI layout: one whole-dataset mosi_data.pkl indexed by
    (part, id) for vision and audio; float regression labels
    (ref: dataset.py:137-145,172-179)."""
    import pickle
    task_dir = tmp_path / "cmu-mosi"
    task_dir.mkdir()
    rng = np.random.RandomState(0)
    table = {}
    for part in ["train", "dev", "test"]:
        table[part] = {
            "vision": rng.randn(3, 20, 35).astype(np.float32),
            "audio": rng.randn(3, 20, 5).astype(np.float32),
        }
    with open(task_dir / "mosi_data.pkl", "wb") as f:
        pickle.dump(table, f)
    for split in ["train", "dev", "test"]:
        with open(task_dir / f"{split}.jsonl", "w") as f:
            for i in range(2):
                f.write(json.dumps({"id": i, "part": split,
                                    "synopsis": f"utt {i}",
                                    "label": 1.5 - i}) + "\n")

    exp = get_preset("synthetic-tiny")
    import dataclasses
    dcfg = dataclasses.replace(exp.data, task="cmu-mosi",
                               task_type="classification",
                               data_path=str(tmp_path), batch_sz=2,
                               audio_raw_len=20, video_len=20)
    mcfg = exp.model.replace(orig_d_v=35, orig_d_a=5, n_classes=1,
                             use_audio_encoder=False, use_poster=False,
                             model="mmtrvat")
    train, _, _, meta = get_data_loaders(dcfg, mcfg, seed=0)
    b = next(iter(train))
    assert b["video"].shape == (2, 20, 35)
    assert b["audio"].shape == (2, 20, 5)
    # regression labels come through as floats, matching the jsonl
    assert b["target"].dtype == np.float32
    assert set(np.asarray(b["target"]).tolist()) == {1.5, 0.5}
    # feature rows match the (part, id) table entries exactly
    np.testing.assert_allclose(
        np.sort(np.asarray(b["video"]), axis=0),
        np.sort(table["train"]["vision"][:2], axis=0), rtol=1e-6)
