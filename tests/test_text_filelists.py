"""utils.text / utils.filelists / utils.probe — vendored-NII utility parity.

The text tokenizer is compared SYMBOL-FOR-SYMBOL against the reference
implementation imported from /root/reference (read-only), not against
hand-copied expectations.
"""

import os
import sys

import numpy as np
import pytest

from scl_deepfake_audio_detection_tpu.utils import filelists as fl
from scl_deepfake_audio_detection_tpu.utils import text as txt

from tests.conftest import REFERENCE, requires_reference


@pytest.fixture(scope="module")
def ref_text_modules():
    """Import the reference text toolkit (needs /root/reference on sys.path
    as a package root; removed afterwards so nothing else resolves there)."""
    sys.path.insert(0, REFERENCE)
    try:
        import importlib

        toolkit_all = importlib.import_module(
            "core_scripts.data_io.text_process.toolkit_all")
        toolkit_en = importlib.import_module(
            "core_scripts.data_io.text_process.toolkit_en")
        yield toolkit_all, toolkit_en
    finally:
        sys.path.remove(REFERENCE)


PARITY_TEXTS = [
    "hello we are {AY2_AY2_ _AY2_AY2} the same 123",  # reference __main__ demo
    "Hello, World!  multiple   spaces",
    "{AH0_B_AH1_V}",
    "edge {K_AE1_T} middle {D_AO1_G} end",
    "punct: a-b c'd (e) f?",
    "42",
    "",
]


@requires_reference
@pytest.mark.parametrize("text", PARITY_TEXTS)
def test_text_to_codes_matches_reference(ref_text_modules, text):
    _, toolkit_en = ref_text_modules
    # reference text_io.text2code without the float32 cast
    chunks = txt.parse_curly_bracket(text)
    want = []
    for i, chunk in enumerate(chunks):
        want += toolkit_en.text2code(chunk, i >= len(chunks) - 1)
    got = txt.text_to_codes(text)
    assert got.dtype == np.int32
    assert got.tolist() == want
    # decode parity too
    assert txt.codes_to_text(got) == toolkit_en.code2text(want)


@requires_reference
def test_symbol_table_matches_reference(ref_text_modules):
    _, toolkit_en = ref_text_modules
    assert txt.symbol_count() == toolkit_en.symbol_num()
    assert txt.eos_index() == toolkit_en.eos_index()
    assert txt.SYMBOLS == toolkit_en._symbols


@requires_reference
def test_curly_parse_matches_reference(ref_text_modules):
    toolkit_all, _ = ref_text_modules
    for text in PARITY_TEXTS + ["{A} {B}", "x{", "a } b"]:
        assert txt.parse_curly_bracket(text) == \
            toolkit_all.parse_curly_bracket(text)


@requires_reference
def test_g2p_cleanup_matches_reference(ref_text_modules):
    _, toolkit_en = ref_text_modules
    seq = [" ", "HH", "AH0", " ", ",", " ", "W", " ", "!", "K"]
    assert txt.clean_g2p_symbols(seq) == toolkit_en.g2poutput_process(seq)


def test_g2p_to_codes_with_injected_tool():
    fake_g2p = lambda s: ["HH", "AH0", " ", "L", "OW1"]
    codes = txt.g2p_to_codes("hello", fake_g2p)
    # round-trips to the phone names (marker becomes a space)
    assert txt.codes_to_text(codes).strip() == "HH AH0 L OW1~"
    with pytest.raises(ValueError, match="phonemic"):
        txt.g2p_to_codes("oops {AH}", fake_g2p)


def test_load_text_file(tmp_path):
    p = tmp_path / "t.txt"
    p.write_bytes(b"Hello\r\nworld 12\n")
    codes = txt.load_text_file(str(p))
    assert codes.tolist() == txt.text_to_codes("Hello world 12").tolist()


# ---------------------------------------------------------------------------
# filelists
# ---------------------------------------------------------------------------

def test_listdir_stems(tmp_path):
    (tmp_path / "a.wav").touch()
    (tmp_path / "b.txt").touch()
    (tmp_path / ".hidden.wav").touch()
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "c.wav").touch()
    assert fl.listdir_stems(str(tmp_path), ext="wav") == ["a"]
    assert fl.listdir_stems(str(tmp_path)) == ["a", "b"]
    rec = fl.listdir_stems(str(tmp_path), ext="wav", recursive=True)
    assert rec == ["a", os.path.join("sub", "c")]  # dotfiles skipped
    assert fl.listdir_stems(str(tmp_path / "missing")) == []


def test_list_set_algebra_and_io(tmp_path):
    assert fl.common_members([3, 1, 2], [2, 4, 3]) == [2, 3]
    assert fl.is_permutation([1, 2, 2], [2, 1, 2])
    assert not fl.is_permutation([1, 2], [1, 2, 2])
    assert fl.is_subset([1, 2, 3], [2, 3])
    assert fl.members_not_in([3, 1, 2], [2]) == [1, 3]
    p = tmp_path / "list.txt"
    fl.write_lines(["a", 7, "c"], str(p))
    assert fl.read_lines(str(p)) == ["a", "7", "c"]
    assert fl.read_lines(str(p), chop=False) == ["a\n", "7\n", "c\n"]
    assert fl.resolve_path("/d", "n", "txt") == "/d/n.txt"
    assert fl.resolve_path("/d", "n", ".txt") == "/d/n.txt"


def test_shuffle_within_blocks_structure():
    rng = np.random.default_rng(0)
    items = list(range(10))
    out = fl.shuffle_within_blocks(items, 4, rng)
    # block membership preserved: {0..3}, {4..7}, {8,9}
    assert sorted(out[0:4]) == [0, 1, 2, 3]
    assert sorted(out[4:8]) == [4, 5, 6, 7]
    assert sorted(out[8:10]) == [8, 9]
    assert fl.shuffle_within_blocks(items, 1, rng) == items
    # deterministic given the generator state
    a = fl.shuffle_within_blocks(items, 4, np.random.default_rng(7))
    b = fl.shuffle_within_blocks(items, 4, np.random.default_rng(7))
    assert a == b


def test_shuffle_blocks_structure():
    rng = np.random.default_rng(3)
    items = list(range(11))  # partial tail: [9, 10] stays put (block 3)
    out = fl.shuffle_blocks(items, 3, rng)
    assert out[9:] == [9, 10]
    # blocks move as units with intra-block order intact
    blocks = [tuple(out[i : i + 3]) for i in range(0, 9, 3)]
    assert sorted(blocks) == [(0, 1, 2), (3, 4, 5), (6, 7, 8)]
    assert sorted(out) == sorted(items)


def test_random_name_map(tmp_path):
    m = fl.RandomNameMap(["r1", "r2", "r3"])
    # pop-from-end draw order, reference-compatible
    assert m.alias_for("fileA") == "r3"
    assert m.alias_for("fileB") == "r2"
    assert m.alias_for("fileA") == "r3"  # repeat-stable
    assert m.filename_for("r2") == "fileB"
    assert m.num_unused == 1
    m.save_unused(str(tmp_path / "unused.txt"))
    assert fl.read_lines(str(tmp_path / "unused.txt")) == ["r1"]
    assert m.items() == [("fileA", "r3"), ("fileB", "r2")]
    with pytest.raises(KeyError, match="never assigned"):
        m.filename_for("r1")
    m.alias_for("fileC")
    with pytest.raises(RuntimeError, match="exhausted"):
        m.alias_for("fileD")
    # round-trip through a pool file
    fl.write_lines(["x", "y"], str(tmp_path / "pool.txt"))
    m2 = fl.RandomNameMap.from_file(str(tmp_path / "pool.txt"))
    assert m2.alias_for("q") == "y"


# ---------------------------------------------------------------------------
# probe
# ---------------------------------------------------------------------------

def test_probe_capture_and_dump(tmp_path):
    import jax.numpy as jnp

    from scl_deepfake_audio_detection_tpu.data.generic_io import read_raw_mat
    from scl_deepfake_audio_detection_tpu.utils import probe

    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    assert probe.to_host(jnp.asarray(x)).tolist() == x.tolist()

    out = probe.quick_write(x, str(tmp_path / "d" / "t.bin"))
    np.testing.assert_array_equal(read_raw_mat(out, 3), x)

    p = probe.DataProbe()
    p.add(x, name="a")
    p.add(jnp.asarray(x) + 1.0, name="a")  # duplicate name -> a#1
    p.add(np.ones((2, 2), np.float32))
    assert len(p) == 3 and p.names()[2] == "probe2"
    assert p.concatenated(axis=1).shape == (2, 8)
    path = p.dump(str(tmp_path / "cap"))
    loaded = np.load(path)
    assert set(loaded.files) == {"a", "a#1", "probe2"}
    np.testing.assert_array_equal(loaded["a#1"], x + 1.0)
    np.testing.assert_array_equal(p.get("a"), x)
    p.clear()
    assert len(p) == 0

    # torch conversion LAST: an importorskip mid-test would silently skip
    # the torch-independent assertions above on torch-less environments
    torch = pytest.importorskip("torch")
    assert probe.to_host(torch.tensor(x, requires_grad=True)).tolist() == x.tolist()


def test_param_moments():
    from scl_deepfake_audio_detection_tpu.utils.probe import param_moments

    params = {"w": np.full((4,), 2.0, np.float32),
              "b": np.zeros((2,), np.float32),
              "step": np.asarray(3, np.int32)}  # non-float: skipped
    m = param_moments(params)
    assert set(k.strip("[]'") for k in m) == {"w", "b"}
    w_key = next(k for k in m if "w" in k)
    assert m[w_key]["mean"] == pytest.approx(2.0)
    assert m[w_key]["std"] == pytest.approx(0.0)
