"""Per-task LAPE registry fidelity (VERDICT r1 Weak #6): every TASKS entry
gets a synthetic-CSV test that exercises the reference semantics — CSV
names/columns, label vocabulary and ids, clip duration, path joins, and the
80/20 stratified split for single-CSV tasks (extras/datasets/*_avg.py)."""
import os

import numpy as np
import pandas as pd
import pytest

from audiossl_tpu.data.wav import write_wav
from audiossl_tpu.downstream.tasks import (
    LID_6,
    SPEECH_COMMANDS_12,
    SPEECH_COMMANDS_35,
    TASKS,
    TUT_URBAN_10,
    build_task_loaders,
)

SR = 16000
BATCH = 4

# per-task synthetic label values (drawn from the fixed vocab when one exists)
LABEL_VALUES = {
    "speech_commands_v1": ["yes", "no", "up", "down"],
    "speech_commands_v2": ["yes", "no", "up", "down"],
    "speech_commands_v2_35": ["sheila", "house", "zero", "marvin"],
    "birdsong_combined": ["song", "call"],
    "iemocap": [0, 1, 2, 3],  # Label_id: pre-assigned ints (iemocap_avg.py:41)
    "libri_100": [0, 1, 2, 3],  # Label_id ints (libri100_avg.py:40)
    "musical_instruments": ["guitar", "flute", "drum"],  # derived vocab
    "tut_urban": ["airport", "bus", "tram", "park"],
    "voxceleb_v1": ["id1", "id2", "id3"],  # derived 1251-speaker vocab
    "language_identification": ["french", "english", "german"],
}

EXPECTED_DURATION = {
    "speech_commands_v1": 1.0, "speech_commands_v2": 1.0,
    "speech_commands_v2_35": 1.0, "birdsong_combined": 10.0, "iemocap": 4.0,
    "libri_100": 13.0, "musical_instruments": 4.0, "tut_urban": 9.0,
    "voxceleb_v1": 8.0, "language_identification": 6.0,
}


def _build_root(tmp_path, task, n=16):
    base = os.path.join(str(tmp_path), task.subdir)
    wav_dir = os.path.join(base, task.path_extra) if task.path_extra else base
    os.makedirs(wav_dir, exist_ok=True)
    values = LABEL_VALUES[task.name]
    rng = np.random.default_rng(3)
    rows = []
    for i in range(n):
        rel = f"clip_{i:02d}.wav"
        wave = 0.2 * np.sin(2 * np.pi * 440.0 * np.arange(3200) / SR)
        write_wav(os.path.join(wav_dir, rel), wave.astype(np.float32), SR)
        rows.append({task.file_col: rel, task.label_col: values[i % len(values)]})
    df = pd.DataFrame(rows)
    if task.split_csv:
        df.to_csv(os.path.join(base, task.split_csv), index=False)
    else:
        df.iloc[: n // 2].to_csv(os.path.join(base, task.train_csv), index=False)
        df.iloc[n // 2 :].to_csv(os.path.join(base, task.test_csv), index=False)
    return base


@pytest.mark.parametrize("name", sorted(TASKS))
def test_task_semantics(name, tmp_path):
    task = TASKS[name]
    _build_root(tmp_path, task)
    train, valid, test, clip = build_task_loaders(
        task, BATCH, SR, workers=1, data_root=str(tmp_path)
    )
    assert clip == int(EXPECTED_DURATION[name] * SR)

    # fixed vocabularies keep the reference id assignment
    if task.labels is not None:
        assert train.label_to_id == task.labels
    # test/valid always reuse the train mapping
    assert test.label_to_id == train.label_to_id

    # one batch loads end-to-end (path joins resolve, labels in range)
    waves, labels = next(iter(train.epoch(0)))
    assert waves.shape == (BATCH, clip)
    n_classes = len(train.label_to_id)
    assert labels.dtype == np.int32 and labels.min() >= 0 and labels.max() < n_classes

    if task.split_csv:
        # 80/20 stratified single-CSV split (random_state=1)
        assert valid is None
        assert train.num_samples == 12 and test.num_samples == 4
        tr_classes = set(np.asarray(train.labels))
        te_classes = set(np.asarray(test.labels))
        n_present = len(set(LABEL_VALUES[name]))  # classes in the synthetic CSV
        assert te_classes <= tr_classes and len(tr_classes) == n_present


def test_fixed_vocab_ids():
    # exact reference id assignments
    assert SPEECH_COMMANDS_12["yes"] == 9 and SPEECH_COMMANDS_12["unknown"] == 0
    assert SPEECH_COMMANDS_35["sheila"] == 0 and SPEECH_COMMANDS_35["house"] == 34
    assert SPEECH_COMMANDS_35["yes"] == 22 and len(SPEECH_COMMANDS_35) == 35
    assert TUT_URBAN_10["tram"] == 9 and len(TUT_URBAN_10) == 10
    assert LID_6["italian"] == 5 and len(LID_6) == 6


def test_voxceleb_csv_names_and_columns():
    t = TASKS["voxceleb_v1"]
    # voxceleb_avg.py:20,48,31,41
    assert (t.train_csv, t.test_csv) == ("train_vox.csv", "test_vox.csv")
    assert (t.file_col, t.label_col) == ("file_path", "label")


def test_libri_wav_subdir_join(tmp_path):
    task = TASKS["libri_100"]
    _build_root(tmp_path, task)
    train, _, _, _ = build_task_loaders(task, BATCH, SR, workers=1, data_root=str(tmp_path))
    # libri100_avg.py:30 joins feat_root + 'wav/' + AudioPath
    assert all(os.sep + os.path.join("libri100", "wav", "clip_") in f or
               "/libri100/wav/clip_" in f for f in train.files)


def test_split_matches_sklearn_reference(tmp_path):
    """The single-CSV split must equal the reference's train_test_split
    (test_size=0.2, random_state=1, stratify=Label)."""
    from sklearn.model_selection import train_test_split

    task = TASKS["language_identification"]
    base = _build_root(tmp_path, task)
    df = pd.read_csv(os.path.join(base, task.split_csv))
    ref_train, ref_test = train_test_split(
        df, test_size=0.2, random_state=1, stratify=df[task.label_col]
    )
    train, _, test, _ = build_task_loaders(task, BATCH, SR, workers=1, data_root=str(tmp_path))
    get_names = lambda files: [os.path.basename(f) for f in files]
    assert get_names(train.files) == list(ref_train[task.file_col])
    assert get_names(test.files) == list(ref_test[task.file_col])
