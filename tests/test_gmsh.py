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


def test_quad16_highorder_import(tmp_path):
    """Order-3 quads: gmsh equispaced nodes are resampled onto the
    Chebyshev-Lobatto lattice; the imported operators must differentiate
    cubic polynomials exactly (reference ext/MultiGridBarrierGmshExt
    resamples any-order tensor elements via getJacobians)."""
    import numpy as np
    from mgbtpu.frontends.gmsh import _gmsh_quad_coords, gmsh_import

    k = 3
    coords = _gmsh_quad_coords(k)
    # two elements [0,1]x[0,1] and [1,2]x[0,1] with shared-edge tags
    tag_of = {}
    def node_tag(pos):
        if pos not in tag_of:
            tag_of[pos] = len(tag_of) + 1
        return tag_of[pos]
    elems = []
    for ox in (0, 1):
        conn = []
        for (i, j) in coords:
            # global lattice position (exact rationals via thirds)
            conn.append(node_tag((3 * ox + i, j)))
        elems.append(conn)
    lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat", "$Nodes",
             str(len(tag_of))]
    for pos, tg in sorted(tag_of.items(), key=lambda kv: kv[1]):
        lines.append(f"{tg} {pos[0]/3.0:.17g} {pos[1]/3.0:.17g} 0")
    lines += ["$EndNodes", "$Elements", str(len(elems))]
    for e, conn in enumerate(elems):
        lines.append(f"{e+1} 36 2 0 1 " + " ".join(map(str, conn)))
    lines += ["$EndElements"]
    path = tmp_path / "quad16.msh"
    path.write_text("\n".join(lines) + "\n")

    out = gmsh_import(str(path))
    geom = out.geometry
    assert geom.x.shape[0] == 16 and geom.x.shape[1] == 2
    # conforming shared edge: 4 shared node ids
    t0 = set(geom.t[:, 0]); t1 = set(geom.t[:, 1])
    assert len(t0 & t1) == 4
    # operator exactness on cubics
    x = geom.xflat()
    f = x[:, 0] ** 3 + x[:, 0] * x[:, 1] ** 2
    dfdx = 3 * x[:, 0] ** 2 + x[:, 1] ** 2
    got = geom.operators["dx"].matvec(f)
    assert np.abs(got - dfdx).max() < 1e-9
    # quadrature exactness: integral of df/dx over [0,2]x[0,1] = 8 + 2/3
    assert abs(float(geom.w @ got) - (8 + 2.0 / 3.0)) < 1e-9


def test_quad64_order7_import(tmp_path):
    """Order-7 quads (gmsh type 48): the any-order tensor path — node-order
    table and Chebyshev resampling are generated for arbitrary k, matching
    the reference's any-order getJacobians resampling
    (ext/MultiGridBarrierGmshExt)."""
    import numpy as np
    from mgbtpu.frontends.gmsh import _gmsh_quad_coords, gmsh_import

    k = 7
    coords = _gmsh_quad_coords(k)
    tag_of = {}

    def node_tag(pos):
        if pos not in tag_of:
            tag_of[pos] = len(tag_of) + 1
        return tag_of[pos]

    elems = []
    for ox in (0, 1):
        conn = [node_tag((k * ox + i, j)) for (i, j) in coords]
        elems.append(conn)
    lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat", "$Nodes",
             str(len(tag_of))]
    for pos, tg in sorted(tag_of.items(), key=lambda kv: kv[1]):
        lines.append(f"{tg} {pos[0]/k:.17g} {pos[1]/k:.17g} 0")
    lines += ["$EndNodes", "$Elements", str(len(elems))]
    for e, conn in enumerate(elems):
        lines.append(f"{e+1} 48 2 0 1 " + " ".join(map(str, conn)))
    lines += ["$EndElements"]
    path = tmp_path / "quad64.msh"
    path.write_text("\n".join(lines) + "\n")

    out = gmsh_import(str(path))
    geom = out.geometry
    assert geom.x.shape[0] == 64 and geom.x.shape[1] == 2
    # conforming shared edge: k+1 shared node ids
    t0 = set(geom.t[:, 0]); t1 = set(geom.t[:, 1])
    assert len(t0 & t1) == k + 1
    # operator exactness on degree-7 polynomials
    x = geom.xflat()
    f = x[:, 0] ** 7 + x[:, 0] * x[:, 1] ** 2
    dfdx = 7 * x[:, 0] ** 6 + x[:, 1] ** 2
    got = geom.operators["dx"].matvec(f)
    assert np.abs(got - dfdx).max() < 1e-7
    # quadrature: integral of df/dx over [0,2]x[0,1] = 2^7 + 2/3
    assert abs(float(geom.w @ got) - (128 + 2.0 / 3.0)) < 1e-7


def test_msh41_binary_roundtrip(tmp_path):
    """Binary v4.1 import matches the equivalent ASCII import."""
    import struct
    import numpy as np
    from mgbtpu.frontends.gmsh import gmsh_import

    # one triangle (1,0),(0,1),(0,0) as a 2D surface entity
    buf = b"$MeshFormat\n4.1 1 8\n"
    buf += struct.pack("<i", 1)
    buf += b"\n$EndMeshFormat\n"
    buf += b"$Entities\n"
    buf += struct.pack("<4q", 0, 0, 1, 0)
    # surface: tag, bbox(6d), numPhys=1 phys=5, numBounding=0
    buf += struct.pack("<i", 1) + struct.pack("<6d", 0, 0, 0, 1, 1, 0)
    buf += struct.pack("<q", 1) + struct.pack("<i", 5) + struct.pack("<q", 0)
    buf += b"\n$EndEntities\n"
    buf += b"$Nodes\n"
    buf += struct.pack("<4q", 1, 3, 1, 3)
    buf += struct.pack("<iiiq", 2, 1, 0, 3)
    buf += struct.pack("<3q", 1, 2, 3)
    buf += struct.pack("<9d", 0, 0, 0, 1, 0, 0, 0, 1, 0)
    buf += b"\n$EndNodes\n"
    buf += b"$Elements\n"
    buf += struct.pack("<4q", 1, 1, 1, 1)
    buf += struct.pack("<iiiq", 2, 1, 2, 1)      # dim 2, ent 1, tri3, 1 elem
    buf += struct.pack("<4q", 1, 1, 2, 3)
    buf += b"\n$EndElements\n"
    path = tmp_path / "bin41.msh"
    path.write_bytes(buf)
    out = gmsh_import(str(path))
    geom = out.geometry
    assert geom.x.shape == (3, 1, 2)
    assert np.abs(np.sort(geom.w)[::-1][0] - geom.w.max()) == 0
    assert "dim2_5" in out.regions and len(out.regions["dim2_5"]) == 3
