"""Ecosystem provisioning (reference BlangTarget.jl:126-180,
TreePPLTarget.jl:163-521): setup/clone/compile/container command
construction, exercised the way the cluster rosetta is — by generating and
inspecting the exact commands, with an injected runner (no JVM, network, or
container engine needed)."""

import os

import pytest

from pigeons_tpu.models import (
    TreePPLBinary,
    blang_executable,
    setup_blang,
    tppl_compile_model,
    tppl_construct_target,
)
from pigeons_tpu.models.ecosystem import (
    construct_apptainer_singularity_cmd,
    construct_docker_podman_cmd,
)
from pigeons_tpu.models.stream import java_seed


class Recorder:
    """Mock runner: records commands and simulates their filesystem effect
    (clone/unzip create the repo directory) so setup_blang's post-install
    verification passes."""

    def __init__(self, creates=None):
        self.calls = []
        self.creates = creates

    def __call__(self, cmd, cwd=None):
        self.calls.append((list(cmd), cwd))
        if self.creates and cmd[0] in ("git", "unzip"):
            os.makedirs(self.creates, exist_ok=True)


def test_setup_blang_precompiled(tmp_path):
    r = Recorder(creates=str(tmp_path / "blangDemos"))
    path = setup_blang("blangDemos", base_dir=str(tmp_path), runner=r)
    assert path == str(tmp_path / "blangDemos")
    (c1, cwd1), (c2, cwd2) = r.calls
    assert c1[:2] == ["curl", "-fL"] and c1[2].endswith("blangDemos.zip")
    assert c2 == ["unzip", "blangDemos.zip"] and cwd2 == str(tmp_path)


def test_setup_blang_clone_and_gradle(tmp_path):
    r = Recorder(creates=str(tmp_path / "myModels"))
    path = setup_blang("myModels", organization="someone", base_dir=str(tmp_path), runner=r)
    (c1, cwd1), (c2, cwd2) = r.calls
    assert c1 == ["git", "clone", "https://github.com/someone/myModels.git"]
    assert cwd1 == str(tmp_path)
    assert c2[0].endswith("gradlew") and c2[1] == "installDist"
    assert cwd2 == path


def test_setup_blang_idempotent(tmp_path):
    (tmp_path / "blangDemos").mkdir()
    r = Recorder()
    assert setup_blang("blangDemos", base_dir=str(tmp_path), runner=r) is None
    assert r.calls == []


def test_blang_executable(tmp_path):
    with pytest.raises(FileNotFoundError, match="setup_blang"):
        blang_executable("blangDemos", "demo.Main", base_dir=str(tmp_path))
    (tmp_path / "blangDemos").mkdir()
    cmd = blang_executable("blangDemos", "demo.Main", base_dir=str(tmp_path))
    assert cmd[0] == "java" and cmd[1] == "-cp" and cmd[3] == "demo.Main"
    assert cmd[2].endswith(os.path.join("build", "install", "blangDemos", "lib", "*"))


def test_tppl_compile_model_direct(tmp_path):
    r = Recorder()
    binary = tppl_compile_model(
        str(tmp_path / "model.tppl"), bin=str(tmp_path / "out"),
        local_exploration_steps=10, sampling_period=10, kernel=True,
        drift=0.01, runner=r,
    )
    (cmd, _), = r.calls
    assert cmd[0] == "tpplc" and cmd[-2:] == ["--output", str(tmp_path / "out")]
    # reference flag set (TreePPLTarget.jl:261-276)
    s = " ".join(cmd)
    assert "-m mcmc-lightweight" in s and "--pigeons" in s
    assert "--pigeons-explore-steps 10" in s and "--sampling-period 10" in s
    assert "--kernel" in s and "--align" in s and "--incremental-printing" in s
    assert "--pigeons-no-global" not in s  # use_global defaults True
    assert binary.path == str(tmp_path / "out") and binary.record_samples


def test_tppl_compile_model_containerized(tmp_path):
    r = Recorder()
    tppl_compile_model(
        str(tmp_path / "m.tppl"), bin=str(tmp_path / "out"),
        container_engine="docker", img_name="img:1", runner=r,
    )
    (cmd, _), = r.calls
    assert cmd[:3] == ["docker", "run", "--rm"]
    assert "-i" not in cmd  # compilation needs no stdin bridge
    vols = [cmd[i + 1] for i, a in enumerate(cmd) if a == "-v"]
    assert any(v.endswith(":/in") for v in vols)
    assert any(v.endswith(":/out") for v in vols)
    assert cmd[-4] == "img:1" and cmd[-3:-1] == ["sh", "-c"]
    assert "/in/m.tppl" in cmd[-1] and "--output /out/out" in cmd[-1]


def test_tppl_compile_rejects_bad_cps_and_engine(tmp_path):
    with pytest.raises(ValueError, match="cps"):
        tppl_compile_model("m.tppl", cps="bogus", runner=Recorder())
    with pytest.raises(ValueError, match="img_name"):
        tppl_compile_model("m.tppl", container_engine="docker", runner=Recorder())
    with pytest.raises(ValueError, match="container engine"):
        tppl_compile_model("m.tppl", container_engine="lxc", img_name="x",
                           runner=Recorder())


def test_container_cmd_constructors():
    d = construct_docker_podman_cmd(
        "./bin data.json", "img", "podman", allow_stdin=True,
        volumes=[("/a", "/in")], envs={"PPL_SEED": "7"},
    )
    assert d[:4] == ["podman", "run", "--rm", "-i"]
    assert ["-v", "/a:/in"] == d[4:6] and ["-e", "PPL_SEED=7"] == d[6:8]
    a = construct_apptainer_singularity_cmd(
        "./bin data.json", "img.sif", "apptainer",
        volumes=[("/a", "/in")], envs={"PPL_SEED": "7"},
    )
    assert a[:2] == ["apptainer", "run"]
    assert ["--bind", "/a:/in"] == a[2:4] and ["--env", "PPL_SEED=7"] == a[4:6]


def test_tppl_construct_target_native(tmp_path):
    binary = TreePPLBinary(path=str(tmp_path / "bin"), record_samples=True)
    out = tmp_path / "samples"
    t = tppl_construct_target(binary, str(tmp_path / "d.json"),
                              output_dir=str(out), seed=3)
    assert out.is_dir()  # created eagerly (reference mkpath)
    cmd = t._command_builder(2)
    assert cmd == [str(tmp_path / "bin"), str(tmp_path / "d.json")]
    env = t._env_builder(2)
    assert env["PPL_SEED"] == str(java_seed(3, 2))
    assert env["PPL_OUTPUT"].endswith("replica=2.json")


def test_tppl_construct_target_containerized(tmp_path):
    binary = TreePPLBinary(
        path=str(tmp_path / "bin"), record_samples=True,
        container_engine="docker", img_name="img:1",
    )
    t = tppl_construct_target(binary, str(tmp_path / "d.json"),
                              output_dir=str(tmp_path / "o"), seed=1)
    cmd = t._command_builder(0)
    assert cmd[:4] == ["docker", "run", "--rm", "-i"]  # stdin bridge kept open
    vols = [cmd[i + 1] for i, a in enumerate(cmd) if a == "-v"]
    assert any(v.endswith(":/in") for v in vols)
    assert any(v.endswith(":/data") for v in vols)
    assert any(v.endswith(":/out") for v in vols)
    envs = [cmd[i + 1] for i, a in enumerate(cmd) if a == "-e"]
    assert any(e.startswith("PPL_SEED=") for e in envs)
    assert any(e == "PPL_OUTPUT=/out/replica=0.json" for e in envs)
    assert cmd[-1] == "/in/bin /data/d.json"
    # host env is untouched for containerized workers (vars ride -e flags)
    assert "PPL_SEED" not in {
        k for k in t._env_builder(0) if k.startswith("PPL_")
    } or t._env_builder(0).get("PPL_SEED") is None


def test_tppl_record_without_output_dir_rejected(tmp_path):
    binary = TreePPLBinary(path=str(tmp_path / "bin"), record_samples=True)
    with pytest.raises(ValueError, match="output_dir"):
        tppl_construct_target(binary, str(tmp_path / "d.json"))


def test_setup_blang_detects_broken_install(tmp_path):
    """A fetch that never materializes the repo directory fails loudly at
    setup time, not later in blang_executable (code-review r4)."""
    with pytest.raises(FileNotFoundError, match="does not exist"):
        setup_blang("blangDemos", base_dir=str(tmp_path), runner=Recorder())
