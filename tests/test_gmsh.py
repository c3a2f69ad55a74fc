"""Gmsh .msh import correctness (reference test_gmsh.jl model), against
hand-written MSH 2.2 / 4.1 files."""
import textwrap

import numpy as np
import pytest

from mgbtpu import amg, assemble, mgb_solve
from mgbtpu.frontends import gmsh_import

MSH22_TRI = """\
$MeshFormat
2.2 0 8
$EndMeshFormat
$PhysicalNames
2
1 10 "left"
2 20 "domain"
$EndPhysicalNames
$Nodes
4
1 -1 -1 0
2 1 -1 0
3 1 1 0
4 -1 1 0
$EndNodes
$Elements
3
1 1 2 10 1 1 4
2 2 2 20 1 1 2 4
3 2 2 20 1 2 3 4
$EndElements
"""

MSH22_QUAD = """\
$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
6
1 -1 -1 0
2 0 -1 0
3 1 -1 0
4 -1 1 0
5 0 1 0
6 1 1 0
$EndNodes
$Elements
2
1 3 0 1 2 5 4
2 3 0 2 3 6 5
$EndElements
"""

MSH41_TRI = """\
$MeshFormat
4.1 0 8
$EndMeshFormat
$PhysicalNames
1
1 10 "left"
$EndPhysicalNames
$Entities
0 1 1 0
7 -1 -1 0 -1 1 0 1 10 0
1 -1 -1 0 1 1 0 0 0 1 7
$EndEntities
$Nodes
2 4 1 4
1 7 0 2
1
4
-1 -1 0
-1 1 0
2 1 0 2
2
3
1 -1 0
1 1 0
$EndNodes
$Elements
2 3 1 3
1 7 1 1
1 1 4
2 1 2 2
2 1 2 4
3 2 3 4
$EndElements
"""


def _write(tmp_path, name, body):
    p = tmp_path / name
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_tri3_import_and_solve(tmp_path):
    out = gmsh_import(_write(tmp_path, "t.msh", MSH22_TRI))
    g = out.geometry
    assert g.x.shape == (3, 2, 2)
    np.testing.assert_allclose(g.w.sum(), 4.0)
    assert "left" in out.regions
    # left edge nodes: x = -1 at nodes 1 and 4
    xf = g.xflat()
    for v, e in out.regions["left"]:
        assert xf[e * 3 + v, 0] == -1.0
    sol = mgb_solve(assemble(amg(g), p=1.0), tol=1e-4)
    assert np.all(np.isfinite(sol.z))


def test_quad4_import(tmp_path):
    out = gmsh_import(_write(tmp_path, "q.msh", MSH22_QUAD))
    g = out.geometry
    assert g.x.shape == (4, 2, 2)
    np.testing.assert_allclose(g.w.sum(), 4.0)
    # operators exact on bilinears
    xf = g.xflat()
    u = xf[:, 0] * xf[:, 1]
    np.testing.assert_allclose(g.operators["dx"] @ u, xf[:, 1], atol=1e-12)


def test_msh41_tri(tmp_path):
    out = gmsh_import(_write(tmp_path, "t41.msh", MSH41_TRI))
    g = out.geometry
    assert g.x.shape == (3, 2, 2)
    np.testing.assert_allclose(g.w.sum(), 4.0)
    assert set(np.asarray(
        [g.xflat()[e * 3 + v, 0] for v, e in out.regions["left"]])) == {-1.0}


def test_reject_serendipity(tmp_path):
    msh = MSH22_QUAD.replace("1 3 0 1 2 5 4", "1 16 0 1 2 5 4 1 2 5 4") \
        .replace("2 3 0 2 3 6 5", "2 16 0 2 3 6 5 2 3 6 5")
    with pytest.raises(ValueError, match="serendipity"):
        gmsh_import(_write(tmp_path, "s.msh", msh))
