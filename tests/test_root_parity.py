"""Parity: root-density profiles vs the COMPILED reference root.cpp.

The round-3 suite checked our quadrature against a re-derived Python
transcription of cardioidDistribution; this drives the unmodified compiled
sources (root::computeRootDensity3D, root.cpp:504-613 — 1-cm atoms, layer
binning, skeleton correction) instead.  root_density_profile now
evaluates the SAME 1-cm atom scheme vectorised (root_density_atoms), so
the comparison is exact to float rounding.
"""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import criteria3d_tpu  # noqa: F401
from criteria3d_tpu.physics import crop as C
from tests.test_crop import make_grid

GOLDEN = Path(__file__).parent / "golden"
BUILD = Path("/tmp/refroot")
RUNNER = BUILD / "root_runner"


@pytest.fixture(scope="module")
def runner():
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    if not RUNNER.exists():
        subprocess.run(["bash", str(GOLDEN / "build_root.sh"), str(BUILD)],
                       check=True, capture_output=True)
    return RUNNER


def oracle_profile(runner, *, shape, deform, depth_min, length, total_depth,
                   coarse, layer_depth, layer_thickness):
    lines = [
        f"{1 if shape == 'cardioid' else 0} {deform} {depth_min} {length} "
        f"{total_depth} {coarse} {len(layer_depth)}",
        " ".join(repr(float(v)) for v in layer_depth),
        " ".join(repr(float(v)) for v in layer_thickness),
    ]
    res = subprocess.run([str(runner)], input="\n".join(lines) + "\n",
                         capture_output=True, text=True, check=True)
    out_lines = res.stdout.splitlines()
    dens = np.array([float(v) for v in out_lines[0].split()])
    first, last = (int(v) for v in out_lines[1].split())
    return dens, first, last


@pytest.mark.parametrize("deform,length", [
    (1.0, 0.6), (1.5, 0.45), (2.0, 0.75), (1.0, 0.2),
])
def test_cardioid_profile_vs_compiled(runner, deform, length):
    grid = make_grid(depth=0.8)
    crop = C.CropParameters(root_depth_min=0.05, root_depth_max=0.8,
                            root_shape_deformation=deform)
    ours = np.asarray(C.root_density_profile(
        crop, grid, jnp.full(grid.shape[1:], length)))[:, 0, 0]
    ref, first, last = oracle_profile(
        runner, shape="cardioid", deform=deform, depth_min=0.05,
        length=length, total_depth=0.8, coarse=0.0,
        layer_depth=np.asarray(grid.layer_depth),
        layer_thickness=np.asarray(grid.layer_thickness))
    assert ours.shape == ref.shape
    assert abs(ours.sum() - 1.0) < 1e-9 and abs(ref.sum() - 1.0) < 1e-9
    # the atom scheme is reproduced exactly (root_density_atoms)
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12,
                               err_msg=f"deform={deform} len={length}")
    # rooted support agrees
    assert np.flatnonzero(ours > 1e-6).max() <= last + 1


def test_skeleton_correction_matches(runner):
    """Coarse fragments scale per-horizon density before renormalisation
    (root.cpp:591-600); with one horizon the normalised profile is
    invariant — verify both implementations agree on that."""
    grid = make_grid(depth=0.8)
    crop = C.CropParameters(root_depth_min=0.05, root_depth_max=0.8,
                            root_shape_deformation=1.0)
    ours = np.asarray(C.root_density_profile(
        crop, grid, jnp.full(grid.shape[1:], 0.5)))[:, 0, 0]
    ref0, _, _ = oracle_profile(
        runner, shape="cardioid", deform=1.0, depth_min=0.05, length=0.5,
        total_depth=0.8, coarse=0.0,
        layer_depth=np.asarray(grid.layer_depth),
        layer_thickness=np.asarray(grid.layer_thickness))
    ref35, _, _ = oracle_profile(
        runner, shape="cardioid", deform=1.0, depth_min=0.05, length=0.5,
        total_depth=0.8, coarse=0.35,
        layer_depth=np.asarray(grid.layer_depth),
        layer_thickness=np.asarray(grid.layer_thickness))
    np.testing.assert_allclose(ref0, ref35, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(ours, ref0, rtol=1e-9, atol=1e-12)
