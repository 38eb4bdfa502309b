"""LAPE downstream task registry.

Rebuilds extras/datasets/* (SURVEY.md §2.2): each task is CSVs with
(audio-path, label) columns under a task root, a fixed or derived label
vocabulary, and a clip duration. One registry entry replaces each of the
reference's per-task Dataset classes (they all share the same pipeline —
e.g. speech_commands_v2_avg.py:16-72); the data path itself runs through
ManifestLoader + the on-device frontend.

Task roots come from the AUDIOSSL_DATA_ROOT env var or explicit CLI paths
(the reference hardcodes cluster paths — data_utils.py:86-94).
"""
from __future__ import annotations

import dataclasses
import os


SPEECH_COMMANDS_12 = {
    "unknown": 0, "down": 1, "go": 2, "silence": 3, "on": 4, "stop": 5,
    "left": 6, "no": 7, "up": 8, "yes": 9, "off": 10, "right": 11,
}


@dataclasses.dataclass(frozen=True)
class TaskSpec:
    name: str
    subdir: str
    train_csv: str = "train_data.csv"
    test_csv: str = "test_data.csv"
    valid_csv: str | None = None
    file_col: str = "AudioPath"
    label_col: str = "Label"
    duration: float = 1.0  # seconds per clip window
    labels: dict | None = None  # fixed vocabulary, else derived from train CSV
    metric: str = "accuracy"

    def resolve(self, root: str | None) -> tuple[str, str, str | None]:
        root = root or os.environ.get("AUDIOSSL_DATA_ROOT", ".")
        base = os.path.join(root, self.subdir)
        return (
            os.path.join(base, self.train_csv),
            os.path.join(base, self.test_csv),
            os.path.join(base, self.valid_csv) if self.valid_csv else None,
        )


TASKS: dict[str, TaskSpec] = {
    t.name: t
    for t in [
        TaskSpec("speech_commands_v1", "speechv1", labels=SPEECH_COMMANDS_12),
        TaskSpec("speech_commands_v2", "speechv2/train", labels=SPEECH_COMMANDS_12),
        TaskSpec("speech_commands_v2_35", "speechv2_35"),
        TaskSpec("birdsong_combined", "birdsong", duration=1.0),
        TaskSpec("iemocap", "iemocap/IEMOCAP", duration=1.0),
        TaskSpec("libri_100", "libri100", duration=1.0),  # speaker ID
        TaskSpec("musical_instruments", "magenta", duration=1.0),
        TaskSpec("tut_urban", "TUT-urban-acoustic-scenes-2018-development", duration=1.0),
        TaskSpec("voxceleb_v1", "voxceleb", duration=1.0),
        TaskSpec("language_identification", "lid", duration=1.0),
    ]
}


def get_task(name: str) -> TaskSpec | None:
    return TASKS.get(name)
