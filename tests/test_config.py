import pytest

from scl_deepfake_audio_detection_tpu.utils import (
    AUGMENTATIONS,
    Config,
    Registry,
    load_config,
)

from conftest import REFERENCE, requires_reference

pytestmark = pytest.mark.smoke  # compile-light fast tier (scripts/check.sh gate)


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


def test_unknown_train_keys_rejected(tmp_path):
    """train:/rawboost: are this framework's own schema — a typo'd key must
    fail loudly, not silently train with the default."""
    import yaml

    from scl_deepfake_audio_detection_tpu.utils.config import load_config

    p = tmp_path / "c.yaml"
    yaml.safe_dump({"model": {"name": "wav2vec2_linear_nll"},
                    "data": {"name": "asvspoof_2019_augall_3"},
                    "train": {"max_Lr": 1e-4}}, open(p, "w"))
    with pytest.raises(ValueError, match="max_Lr"):
        load_config(str(p))
    yaml.safe_dump({"model": {"name": "wav2vec2_linear_nll"},
                    "data": {"name": "asvspoof_2019_augall_3"},
                    "rawboost": {"nbands": 3}}, open(p, "w"))
    with pytest.raises(ValueError, match="nbands"):
        load_config(str(p))


def test_registry_membership_is_import_order_independent():
    from scl_deepfake_audio_detection_tpu.utils.registry import DATASETS, MODELS

    # __contains__/names() must lazily populate like get()
    assert "wav2vec2_linear_nll" in MODELS
    assert "asvspoof_2019_augall_3" in DATASETS
    assert "wav2vec2_linear_nll" in MODELS.names()
