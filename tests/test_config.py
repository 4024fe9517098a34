import pytest

from scl_deepfake_audio_detection_tpu.utils import (
    AUGMENTATIONS,
    Config,
    Registry,
    load_config,
)

from conftest import REFERENCE, requires_reference


@requires_reference
def test_load_reference_conf3_yaml():
    cfg = load_config(f"{REFERENCE}/configs/conf-3-linear.yaml")
    assert cfg.model.name == "xlsr_linear_nll"  # mapped from wav2vec2_linear_nll
    assert cfg.model.flag_fix_ssl is False
    assert cfg.model.contra_mode == "all"
    assert cfg.model.loss_type == 1
    assert cfg.data.name == "asvspoof_2019_augall_3"
    assert cfg.data.kwargs["vocoders"] == ["hifigan", "hn-sinc-nsf-hifi", "waveglow"]
    assert cfg.data.kwargs["augmentation_methods"] == [
        "RawBoost12",
        "background_noise_wrapper",
        "reverb_wrapper",
    ]
    assert cfg.data.kwargs["trim_length"] == 64000


@requires_reference
def test_load_reference_btse_yaml_keeps_extra_keys():
    cfg = load_config(f"{REFERENCE}/configs/conf-5-btse-trans64.yaml")
    assert cfg.model.name == "xlsr_btse"
    assert len(cfg.model.extra) > 0  # btse hyperparams preserved


def test_model_tag_naming():
    cfg = Config()
    cfg.train.comment = "conf-3"
    assert cfg.train.model_tag() == "model_weighted_CCE_100_1_1e-08_conf-3"


def test_rawboost_defaults_match_reference_cli():
    cfg = Config()
    rb = cfg.rawboost
    assert (rb.algo, rb.nBands, rb.minF, rb.maxF) == (5, 5, 20, 8000)
    assert (rb.N_f, rb.P, rb.g_sd, rb.SNRmin, rb.SNRmax) == (5, 10, 2, 10, 40)


def test_registry_rejects_duplicates_and_reports_unknown():
    r = Registry("thing")

    @r.register("a")
    def a():
        return 1

    with pytest.raises(KeyError):

        @r.register("a")
        def b():
            return 2

    with pytest.raises(KeyError, match="unknown thing"):
        r.get("nope")
    assert r.get("a") is a
