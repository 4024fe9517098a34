"""Protocol / file-list parsing.

The reference ships three protocol formats (survey of
``DATA/asvspoof_2019_supcon/protocol.txt``, ``DATA/in_the_wild/protocol.txt``
and the ``scp/*.lst`` file lists; consumed by each ``datautils/*.genList``):

1. SCL/supcon layout (``asvspoof_2019_augall_3.py:14-47``): the database dir
   holds ``protocol.txt`` (``speaker utt - attack label``) plus ``scp/``
   file lists (``train_bonafide.lst``, ``dev_bonafide.lst``, ``test.lst``)
   that drive train/dev/eval splits.
2. Generic eval layout (``eval_only.py:24-35``): ``protocol.txt`` lines are
   ``<relative audio path> <subset> <label>``.
3. ASVspoof'19-style five-column metadata used for offline EER analysis
   (``Result.ipynb``): ``speaker utt - attack label``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

BONAFIDE, SPOOF = 1, 0

_LABEL_MAP = {"bonafide": BONAFIDE, "bona-fide": BONAFIDE, "spoof": SPOOF, "fake": SPOOF}


@dataclass(frozen=True)
class Trial:
    utt: str  # utterance id / relative audio path
    label: Optional[int]  # 1 bonafide, 0 spoof, None unknown
    speaker: Optional[str] = None
    attack: Optional[str] = None
    subset: Optional[str] = None


def _read_lines(path: str) -> List[str]:
    with open(path, "r") as f:
        return [ln.strip() for ln in f if ln.strip()]


def read_scp(path: str) -> List[str]:
    """One utterance filename per line (``scp/*.lst``)."""
    return [ln.split()[0] for ln in _read_lines(path)]


def parse_asvspoof_protocol(path: str) -> List[Trial]:
    """``speaker utt phy attack label`` lines (format 1/3)."""
    trials = []
    for ln in _read_lines(path):
        parts = ln.split()
        if len(parts) < 5:
            raise ValueError(f"bad asvspoof protocol line in {path}: {ln!r}")
        spk, utt, _phy, attack, label = parts[:5]
        trials.append(
            Trial(utt=utt, label=_LABEL_MAP.get(label.lower()), speaker=spk, attack=attack)
        )
    return trials


def parse_subset_protocol(path: str) -> List[Trial]:
    """``<path> <subset> <label>`` lines (format 2, ``eval_only.py:18-23``)."""
    trials = []
    for ln in _read_lines(path):
        parts = ln.split()
        if len(parts) < 3:
            raise ValueError(f"bad subset protocol line in {path}: {ln!r}")
        utt, subset, label = parts[:3]
        trials.append(Trial(utt=utt, label=_LABEL_MAP.get(label.lower()), subset=subset))
    return trials


def sniff_protocol(path: str) -> str:
    """Guess the protocol flavor from the first line: 'asvspoof' or 'subset'."""
    first = _read_lines(path)[0].split()
    return "asvspoof" if len(first) >= 5 else "subset"


def parse_protocol(path: str) -> List[Trial]:
    return (
        parse_asvspoof_protocol(path)
        if sniff_protocol(path) == "asvspoof"
        else parse_subset_protocol(path)
    )


def label_map(trials: List[Trial], strip_ext: bool = False) -> Dict[str, int]:
    """utt -> {0,1}; optionally keyed on the extension-less basename the way
    ``Result.ipynb`` joins score files against protocols."""
    out = {}
    for t in trials:
        if t.label is None:
            continue
        key = t.utt
        if strip_ext:
            key = os.path.basename(key).split(".")[0]
        out[key] = t.label
    return out


def gen_list_scl(
    database_path: str, split: str
) -> Tuple[Dict[str, int], List[str]]:
    """Train/dev/eval file lists for the SCL supcon layout.

    Mirrors ``asvspoof_2019_augall_3.genList`` (reference ``:14-47``): the
    splits are the ``scp/`` lists next to ``protocol.txt``; train/dev lists
    enumerate bonafide anchors only (labels implied 1), eval returns the test
    list with no labels.
    """
    scp = {
        "train": "scp/train_bonafide.lst",
        "dev": "scp/dev_bonafide.lst",
        "eval": "scp/test.lst",
    }
    if split not in scp:
        raise ValueError(f"split must be train/dev/eval, got {split!r}")
    return {}, read_scp(os.path.join(database_path, scp[split]))


def gen_list_eval_only(database_path: str) -> Tuple[Dict[str, int], List[str]]:
    """Eval file list for the generic layout (``eval_only.genList`` ``:24-35``)."""
    trials = parse_subset_protocol(os.path.join(database_path, "protocol.txt"))
    return {}, [t.utt for t in trials]


def gen_list_spoof_dirs(database_path: str, split: str) -> Tuple[Dict[str, int], List[str]]:
    """File lists for SCL variants that also train on real spoof data.

    ``SCL_normal.genList`` / ``asvspoof_2019_augall_5.genList`` additionally
    read ``scp/train_spoof.lst`` / ``scp/dev_spoof.lst`` for utterances under
    ``spoof_train``/``spoof_dev`` (or ``spoof``) directories.  Missing lists
    degrade to the bonafide-only behavior.
    """
    labels, files = gen_list_scl(database_path, split)
    if split in ("train", "dev"):
        spoof_lst = os.path.join(database_path, f"scp/{split}_spoof.lst")
        if os.path.exists(spoof_lst):
            for utt in read_scp(spoof_lst):
                labels[utt] = SPOOF
    return labels, files
