from scl_deepfake_audio_detection_tpu.data.protocols import (
    BONAFIDE,
    SPOOF,
    gen_list_eval_only,
    gen_list_scl,
    label_map,
    parse_protocol,
    sniff_protocol,
)

from conftest import REFERENCE, requires_reference
import pytest


pytestmark = pytest.mark.smoke  # compile-light fast tier (scripts/check.sh gate)


@requires_reference
def test_sniff_formats():
    assert sniff_protocol(f"{REFERENCE}/DATA/asvspoof_2019_supcon/protocol.txt") == "asvspoof"
    assert sniff_protocol(f"{REFERENCE}/DATA/in_the_wild/protocol.txt") == "subset"


@requires_reference
def test_parse_supcon_protocol():
    trials = parse_protocol(f"{REFERENCE}/DATA/asvspoof_2019_supcon/protocol.txt")
    assert len(trials) == 96877
    labels = {t.utt: t.label for t in trials}
    assert labels["hifigan_LA_T_1138215"] == SPOOF
    assert labels["LA_T_1138215"] == BONAFIDE


@requires_reference
def test_parse_in_the_wild_protocol():
    trials = parse_protocol(f"{REFERENCE}/DATA/in_the_wild/protocol.txt")
    assert len(trials) == 31778
    assert trials[0].utt == "wav/1.wav"
    assert trials[0].subset == "eval"
    assert trials[0].label == SPOOF


@requires_reference
def test_gen_list_scl_splits():
    _, train = gen_list_scl(f"{REFERENCE}/DATA/asvspoof_2019_supcon", "train")
    _, dev = gen_list_scl(f"{REFERENCE}/DATA/asvspoof_2019_supcon", "dev")
    _, ev = gen_list_scl(f"{REFERENCE}/DATA/asvspoof_2019_supcon", "eval")
    assert (len(train), len(dev), len(ev)) == (2580, 2548, 71933)
    assert train[0].endswith(".wav")
    assert ev[0].endswith(".flac")


@requires_reference
def test_gen_list_eval_only():
    _, files = gen_list_eval_only(f"{REFERENCE}/DATA/in_the_wild")
    assert len(files) == 31778
    assert files[0] == "wav/1.wav"


@requires_reference
def test_label_map_strip_ext():
    trials = parse_protocol(f"{REFERENCE}/DATA/in_the_wild/protocol.txt")
    m = label_map(trials, strip_ext=True)
    assert m["1"] == SPOOF
