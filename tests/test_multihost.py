"""Real multi-process validation of --multihost: OS processes form a
jax.distributed CPU cluster and train/eval through the CLI.  Trajectories
must be identical across processes (sharded loaders + global-mesh
collectives + ZeRO-1 moments), and the collective checkpoint save must
write exactly once (process 0).

Failure story at scale (documented expectation, same crash semantics as the
reference's single process): a process dying MID-COLLECTIVE stalls the
remaining processes inside the XLA collective until jax.distributed's
heartbeat/barrier timeout tears the cluster down; there is no in-job
recovery — the job is over, restart every process and resume from
last.ckpt (exact resume incl. ZeRO-1 re-sharding + EarlyStop counter).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

from scl_deepfake_audio_detection_tpu.utils.audio_io import save_wav

pytestmark = pytest.mark.slow  # heavy family: excluded from the smoke gate

SR = 16000
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _make_db(root, train, dev, ev, seed=0, num_additional_real=1):
    """Synthetic SCL database: bonafide+vocoded audio for ``train``/``dev``
    names, eval audio for ``ev`` names, scp lists, and a cfg.yaml."""
    rng = np.random.default_rng(seed)
    for d in ("bonafide", "vocoded", "eval", "scp", "musan", "rirs"):
        os.makedirs(root / d, exist_ok=True)
    for u in train + dev:
        n = int(rng.integers(4000, 9000))
        save_wav(str(root / "bonafide" / u),
                 (rng.normal(size=n) * 0.2).astype(np.float32), SR)
        save_wav(str(root / "vocoded" / f"hifigan_{u}"),
                 (rng.normal(size=n) * 0.2).astype(np.float32), SR)
    for u in ev:
        n = int(rng.integers(4000, 9000))
        save_wav(str(root / "eval" / u),
                 (rng.normal(size=n) * 0.2).astype(np.float32), SR)
    save_wav(str(root / "musan" / "n.wav"),
             (rng.normal(size=SR) * 0.1).astype(np.float32), SR)
    rir = np.zeros(200, np.float32)
    rir[0] = 1.0
    save_wav(str(root / "rirs" / "r.wav"), rir, SR)
    (root / "scp" / "train_bonafide.lst").write_text("\n".join(train) + "\n")
    (root / "scp" / "dev_bonafide.lst").write_text("\n".join(dev) + "\n")
    (root / "scp" / "test.lst").write_text("\n".join(ev) + "\n")
    (root / "cfg.yaml").write_text(f"""
model:
  name: wav2vec2_linear_nll
  flag_fix_ssl: false
  contra_mode: 'all'
  loss_type: 1
data:
  name: 'asvspoof_2019_augall_3'
  kwargs:
    vocoders: ['hifigan']
    augmentation_methods: ["RawBoost12"]
    num_additional_real: {num_additional_real}
    trim_length: 4000
    wav_samp_rate: 16000
    online_aug: true
    aug_dir: '{root}/aug'
    noise_path: '{root}/musan'
    rir_path: '{root}/rirs'
""")
    return root


def _cli_code(db, argv_tail: str) -> str:
    """Child-process source: force CPU, import the CLI, run with the db's
    config + the given extra argv (a comma-led argument string)."""
    return (
        "import sys, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "from scl_deepfake_audio_detection_tpu.cli import main\n"
        "sys.exit(main(["
        f"'--config', r'{db}/cfg.yaml', '--database_path', r'{db}/',"
        # share the suite's persistent compile cache: N cluster processes
        # all cold-compiling the same programs serially on this 1-core host
        # is what pushed the straggler spread past the shutdown barrier
        "'--jax_cache', '/tmp/scl_tpu_jax_cache',"
        f"{argv_tail}]))\n"
    )


def _launch_cluster(nprocs, code, port, timeout=900, devices_per_proc=1):
    procs = []
    for pid in range(nprocs):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(
                f"--xla_force_host_platform_device_count={devices_per_proc}"
            ),
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES=str(nprocs),
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
    return outs


def _assert_identical_trajectory(outs):
    ms = [re.search(r"train_loss=([0-9.]+)", o) for o in outs]
    assert all(ms), outs[0][-2000:]
    assert len({m.group(1) for m in ms}) == 1, outs[0][-2000:]


def _assert_single_checkpoint(out_dir):
    import glob

    cks = glob.glob(out_dir + "/**/last.ckpt", recursive=True)
    assert len(cks) == 1
    from scl_deepfake_audio_detection_tpu.train import checkpoint as ckpt

    tree, extra = ckpt.load(cks[0])
    assert "params" in tree and extra["epoch"] == 0
    return cks[0]


@pytest.fixture(scope="module")
def mh_db(tmp_path_factory):
    utts = [f"u{i}.wav" for i in range(12)]
    return _make_db(tmp_path_factory.mktemp("mh_db"),
                    train=utts[:8], dev=utts[8:], ev=utts, seed=0)


@pytest.fixture(scope="module")
def mh_db4(tmp_path_factory):
    """13-utterance eval set so 4 hosts get UNEVEN shards (4/3/3/3) — the
    remainder path 2-process tests never hit."""
    return _make_db(tmp_path_factory.mktemp("mh_db4"),
                    train=[f"t{i}.wav" for i in range(8)],
                    dev=[f"d{i}.wav" for i in range(4)],
                    ev=[f"e{i}.wav" for i in range(13)], seed=1)


def test_two_process_multihost_train(mh_db, tmp_path):
    out_dir = str(tmp_path / "out")
    outs = _launch_cluster(2, _cli_code(mh_db, (
        "'--batch_size', '2', '--groups_per_step', '2', '--num_epochs', '1',"
        "'--seed', '7', '--ssl_preset', 'tiny', '--num_workers', '1',"
        f"'--out_dir', r'{out_dir}', '--multihost', '--zero1'"
    )), _free_port(), timeout=540, devices_per_proc=2)
    # identical trajectory on both processes (one global batch per step);
    # collective save: exactly one checkpoint tree, written by process 0
    _assert_identical_trajectory(outs)
    _assert_single_checkpoint(out_dir)


def test_two_process_multihost_train_eer_metric(mh_db, tmp_path):
    """--early_metric eer on a real 2-process cluster: the dev score/label
    arrays are sharded across processes, so the per-epoch EER assembly must
    run process_allgather (engine._host_gather) as a collective on every
    process — a single-host test can't exercise that path."""
    import glob
    import json

    out_dir = str(tmp_path / "out_eer")
    outs = _launch_cluster(2, _cli_code(mh_db, (
        "'--batch_size', '2', '--groups_per_step', '2', '--num_epochs', '1',"
        "'--seed', '7', '--ssl_preset', 'tiny', '--num_workers', '1',"
        f"'--out_dir', r'{out_dir}', '--multihost', '--zero1',"
        "'--early_metric', 'eer'"
    )), _free_port(), timeout=540, devices_per_proc=2)
    _assert_identical_trajectory(outs)
    ck = _assert_single_checkpoint(out_dir)
    from scl_deepfake_audio_detection_tpu.train import checkpoint as ckpt

    _, extra = ckpt.load(ck)
    assert extra["es_metric"] == "eer"
    mfile = glob.glob(out_dir + "/**/metrics.jsonl", recursive=True)
    assert len(mfile) == 1  # process 0 only
    rows = [json.loads(ln) for ln in open(mfile[0])]
    assert rows and all(
        "val_eer" in r and np.isfinite(r["val_eer"]) for r in rows
    ), rows


def test_two_process_multihost_eval_part_files(mh_db, tmp_path):
    """--multihost eval: each process scores its file-list slice on its own
    local mesh and writes <out>.part<k>; the shards are disjoint and cover
    the eval set."""
    scores = str(tmp_path / "scores.txt")
    _launch_cluster(2, _cli_code(mh_db, (
        "'--batch_size', '2', '--eval', '--ssl_preset', 'tiny',"
        f"'--num_workers', '1', '--eval_output', r'{scores}', '--multihost'"
    )), _free_port(), timeout=540, devices_per_proc=2)
    shards = [open(scores + f".part{k}").read().strip().splitlines()
              for k in range(2)]
    utts = [ln.split()[0] for sh in shards for ln in sh]
    assert len(utts) == 12 and len(set(utts)) == 12  # disjoint, complete


def test_four_process_multihost_train_and_uneven_eval(mh_db4, tmp_path):
    """4 processes / 4-device global mesh: two train steps (8 anchors, one
    group per process per step) with ZeRO-1 + collective checkpoint, then a
    13-file eval whose per-host shards are UNEVEN (4/3/3/3)."""
    out_dir = str(tmp_path / "out")
    outs = _launch_cluster(4, _cli_code(mh_db4, (
        "'--batch_size', '1', '--groups_per_step', '1', '--num_epochs', '1',"
        "'--seed', '7', '--ssl_preset', 'tiny', '--num_workers', '1',"
        f"'--out_dir', r'{out_dir}', '--multihost', '--zero1'"
    )), _free_port())
    _assert_identical_trajectory(outs)
    _assert_single_checkpoint(out_dir)

    # --- uneven eval shards over the same 4-process layout ------------------
    scores = str(tmp_path / "scores.txt")
    _launch_cluster(4, _cli_code(mh_db4, (
        "'--batch_size', '2', '--eval', '--ssl_preset', 'tiny',"
        f"'--num_workers', '1', '--eval_output', r'{scores}', '--multihost'"
    )), _free_port())
    shards = [open(scores + f".part{k}").read().strip().splitlines()
              for k in range(4)]
    sizes = sorted(len(s) for s in shards)
    assert sizes == [3, 3, 3, 4], sizes  # genuinely uneven, none dropped
    utts = [ln.split()[0] for sh in shards for ln in sh]
    assert len(utts) == 13 and len(set(utts)) == 13  # disjoint, complete
