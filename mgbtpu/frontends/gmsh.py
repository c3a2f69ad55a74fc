"""Gmsh mesh import: a native .msh parser (ASCII v2.2 and v4.1).

Reads the highest-dimensional elements of a Gmsh mesh, chooses the matching
FEM family, reorders nodes into the tensor/triangle local layouts, builds
exact connectivity from the Gmsh node tags, and converts every physical
group into a (vertex, element) node-pair list — the same format as
``find_boundary``, so it feeds ``amg(dirichlet_nodes=...)`` directly.
Capability parity with reference ``ext/MultiGridBarrierGmshExt`` (family
table in its header comment); unlike the reference this does not require the
gmsh library — the MSH file format is parsed directly.

Family selection (single element type required):
    3-node triangles   -> fem2d_P1
    6-node triangles   -> fem2d_P2 (bubble synthesized at the barycenter
                          image by default; bubble=False imports pure P2)
    4/9-node quads     -> fem2d, order 1/2 (non-planar -> embedded surface)
    8/27-node hexes    -> fem3d, order 1/2

Rejected with actionable messages: serendipity elements (8-node quads,
20-node hexes), P3+ triangles, tetrahedra, prisms, pyramids, order >= 3
tensor elements (Gmsh uses equispaced high-order nodes; resampling onto
Chebyshev nodes is not implemented in the file-parser path), mixed meshes.
"""
from __future__ import annotations

from types import SimpleNamespace

import numpy as np

# gmsh element type -> (family, nodes, dim)
_TYPES = {
    1: ("line2", 2, 1), 8: ("line3", 3, 1), 15: ("point", 1, 0),
    2: ("tri3", 3, 2), 9: ("tri6", 6, 2), 21: ("tri10", 10, 2),
    3: ("quad4", 4, 2), 10: ("quad9", 9, 2), 16: ("quad8", 8, 2),
    4: ("tet4", 4, 3), 11: ("tet10", 10, 3),
    5: ("hex8", 8, 3), 12: ("hex27", 27, 3), 17: ("hex20", 20, 3),
    6: ("prism6", 6, 3), 7: ("pyr5", 5, 3),
    26: ("line4", 4, 1), 36: ("quad16", 16, 2),
}

_REJECT = {
    "quad8": "8-node serendipity quads are not supported; remesh with full "
             "9-node quads (gmsh: Mesh.SecondOrderIncomplete = 0)",
    "hex20": "20-node serendipity hexes are not supported; remesh with full "
             "27-node hexes (gmsh: Mesh.SecondOrderIncomplete = 0)",
    "tri10": "P3+ triangles are not supported; use P1/P2 triangles or "
             "tensor quads",
    "tet4": "tetrahedra are not supported; mesh with hexahedra",
    "tet10": "tetrahedra are not supported; mesh with hexahedra",
    "prism6": "prisms are not supported; mesh with hexahedra",
    "pyr5": "pyramids are not supported; mesh with hexahedra",
    "quad16": "order >= 3 tensor elements need Chebyshev resampling, which "
              "the file-parser import does not provide; use order <= 2",
}


def _parse_msh(path):
    """Parse ASCII .msh -> (nodes: {tag: xyz}, elements: [(etype, tags,
    nodetags)], physical names {(dim, id): name}, entity->physical map)."""
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0
    version = None
    nodes = {}
    elements = []
    physnames = {}
    ent_phys = {}   # (dim, entity_tag) -> [physical ids]

    n = len(lines)
    while i < n:
        s = lines[i].strip()
        if s == "$MeshFormat":
            version = float(lines[i + 1].split()[0])
            i += 3
        elif s == "$PhysicalNames":
            cnt = int(lines[i + 1])
            for j in range(cnt):
                parts = lines[i + 2 + j].split(maxsplit=2)
                physnames[(int(parts[0]), int(parts[1]))] = \
                    parts[2].strip().strip('"')
            i += cnt + 3
        elif s == "$Entities" and version >= 4:
            counts = [int(x) for x in lines[i + 1].split()]
            j = i + 2
            for dim, cnt in enumerate(counts):
                for _ in range(cnt):
                    parts = lines[j].split()
                    tag = int(parts[0])
                    off = 4 if dim == 0 else 7
                    nph = int(parts[off])
                    ent_phys[(dim, tag)] = [int(x)
                                            for x in parts[off + 1:off + 1 + nph]]
                    j += 1
            i = j
        elif s == "$Nodes":
            if version >= 4:
                hdr = lines[i + 1].split()
                nblocks = int(hdr[0])
                j = i + 2
                for _ in range(nblocks):
                    _, _, _, nn = (int(x) for x in lines[j].split())
                    tags = [int(lines[j + 1 + q]) for q in range(nn)]
                    for q in range(nn):
                        xyz = [float(x) for x in lines[j + 1 + nn + q].split()]
                        nodes[tags[q]] = np.array(xyz[:3])
                    j += 1 + 2 * nn
                i = j
            else:
                nn = int(lines[i + 1])
                for q in range(nn):
                    parts = lines[i + 2 + q].split()
                    nodes[int(parts[0])] = np.array(
                        [float(x) for x in parts[1:4]])
                i += nn + 3
        elif s == "$Elements":
            if version >= 4:
                hdr = lines[i + 1].split()
                nblocks = int(hdr[0])
                j = i + 2
                for _ in range(nblocks):
                    edim, etag, etype, ne = (int(x) for x in lines[j].split())
                    phys = ent_phys.get((edim, etag), [])
                    for q in range(ne):
                        parts = [int(x) for x in lines[j + 1 + q].split()]
                        elements.append((etype, phys, parts[1:]))
                    j += 1 + ne
                i = j
            else:
                ne = int(lines[i + 1])
                for q in range(ne):
                    parts = [int(x) for x in lines[i + 2 + q].split()]
                    etype, ntags = parts[1], parts[2]
                    tags = parts[3:3 + ntags]
                    phys = tags[:1] if ntags else []
                    elements.append((etype, phys, parts[3 + ntags:]))
                i += ne + 3
        else:
            i += 1
    if version is None:
        raise ValueError(f"{path}: not a Gmsh .msh file (no $MeshFormat)")
    return nodes, elements, physnames


# Local-node reorder tables: gmsh order -> mgbtpu order.
# quads: our tensor order is axis-1 fastest over ascending coordinates.
_QUAD4 = [0, 1, 3, 2]          # gmsh corners ccw -> (-,-),(+,-),(-,+),(+,+)
_QUAD9 = [0, 4, 1, 7, 8, 5, 3, 6, 2]
# hexes: gmsh hex8 corner order -> tensor (-,-,-),(+,-,-),(-,+,-),(+,+,-),...
_HEX8 = [0, 1, 3, 2, 4, 5, 7, 6]
# gmsh hex27: 8 corners, 12 edges, 6 faces, 1 volume (gmsh doc order)
_HEX27_GMSH_POS = {
    0: (-1, -1, -1), 1: (1, -1, -1), 2: (1, 1, -1), 3: (-1, 1, -1),
    4: (-1, -1, 1), 5: (1, -1, 1), 6: (1, 1, 1), 7: (-1, 1, 1),
    8: (0, -1, -1), 9: (-1, 0, -1), 10: (-1, -1, 0), 11: (1, 0, -1),
    12: (1, -1, 0), 13: (0, 1, -1), 14: (1, 1, 0), 15: (-1, 1, 0),
    16: (0, -1, 1), 17: (-1, 0, 1), 18: (1, 0, 1), 19: (0, 1, 1),
    20: (0, 0, -1), 21: (0, -1, 0), 22: (-1, 0, 0), 23: (1, 0, 0),
    24: (0, 1, 0), 25: (0, 0, 1), 26: (0, 0, 0),
}


def _hex27_table():
    out = [None] * 27
    for g, pos in _HEX27_GMSH_POS.items():
        i = (pos[0] + 1) + 3 * (pos[1] + 1) + 9 * (pos[2] + 1)
        out[i] = g
    return out


_HEX27 = _hex27_table()

# triangle flip (orientation repair): c1, e31, c3, e23, c2, e12
_TRI6_FLIP = [0, 5, 4, 3, 2, 1]
_TRI3_FLIP = [0, 2, 1]


def _flip_axis1(idx_order, s, d):
    """Reverse tensor axis 1 of a local (s^d) ordering (orientation fix)."""
    out = []
    grid = np.arange(s ** d).reshape([s] * d, order="F")
    flipped = np.flip(grid, axis=0)
    perm = flipped.reshape(-1, order="F")
    return [idx_order[p] for p in perm]


def gmsh_import(path, *, bubble=True, dtype=np.float64):
    """Import a .msh file -> SimpleNamespace(geometry, regions).

    ``regions`` maps each physical-group name (or "dim<d>_<id>" when
    unnamed) to a list of (vertex, element) pairs into the volume mesh —
    pass them to ``amg(geom, dirichlet_nodes={...})``.
    """
    from ..discretize import fem2d, fem3d, fem2d_P1, fem2d_P2

    nodes, elements, physnames = _parse_msh(path)
    dims = {_TYPES[t][2] for t, _, _ in elements if t in _TYPES}
    unknown = {t for t, _, _ in elements if t not in _TYPES}
    if unknown:
        raise ValueError(f"gmsh_import: unsupported element types {unknown}")
    if not dims:
        raise ValueError("gmsh_import: no mesh elements found")
    d = max(dims)
    vol = [(t, phys, conn) for t, phys, conn in elements if _TYPES[t][2] == d]
    fams = {_TYPES[t][0] for t, _, _ in vol}
    if len(fams) != 1:
        raise ValueError(f"gmsh_import: mixed element types {sorted(fams)}; "
                         "a single family is required")
    fam = fams.pop()
    if fam in _REJECT:
        raise ValueError(f"gmsh_import: {_REJECT[fam]}")

    N = len(vol)
    conns = [conn for _, _, conn in vol]

    def coords(tag):
        return nodes[tag]

    # ambient dimension: drop trailing zero coordinate columns
    all_xyz = np.array([nodes[t] for c in conns for t in c])
    ambient = 3 if np.abs(all_xyz[:, 2]).max() > 1e-12 else 2
    if d == 3:
        ambient = 3

    def build_K(order_table, V, e_amb):
        K = np.empty((V, N, e_amb), dtype=dtype)
        tag_grid = np.empty((V, N), dtype=np.int64)
        for e, conn in enumerate(conns):
            for v, g in enumerate(order_table):
                K[v, e, :] = coords(conn[g])[:e_amb]
                tag_grid[v, e] = conn[g]
        return K, tag_grid

    if fam == "tri3":
        K, tags = build_K([0, 1, 2], 3, 2)
        # orientation repair
        for e in range(N):
            v1 = K[1, e] - K[0, e]
            v2 = K[2, e] - K[0, e]
            if v1[0] * v2[1] - v1[1] * v2[0] < 0:
                K[:, e] = K[_TRI3_FLIP, e]
                tags[:, e] = tags[_TRI3_FLIP, e]
        _, t = _dedup_tags(tags)
        geom = fem2d_P1(K=K, t=t, dtype=dtype)
        Vn = 3
    elif fam == "tri6":
        # gmsh tri6: corners 0,1,2 then edge mids (01),(12),(20)
        order = [0, 3, 1, 4, 2, 5]
        K6, tags6 = build_K(order, 6, 2)
        for e in range(N):
            v1 = K6[2, e] - K6[0, e]
            v2 = K6[4, e] - K6[0, e]
            if v1[0] * v2[1] - v1[1] * v2[0] < 0:
                K6[:, e] = K6[_TRI6_FLIP, e]
                tags6[:, e] = tags6[_TRI6_FLIP, e]
        if bubble:
            # bubble node at the P2 map's barycenter image; fresh ids
            xc = (-(K6[0] + K6[2] + K6[4]) + 4 * (K6[1] + K6[3] + K6[5])) / 9.0
            K = np.concatenate([K6, xc[None]], axis=0)
            tags = np.concatenate(
                [tags6, -(1 + np.arange(N, dtype=np.int64))[None]], axis=0)
            Vn = 7
        else:
            K, tags = K6, tags6
            Vn = 6
        _, t = _dedup_tags(tags)
        geom = fem2d_P2(K=K, t=t, dtype=dtype, bubble=bubble)
    elif fam in ("quad4", "quad9"):
        table = _QUAD4 if fam == "quad4" else _QUAD9
        V = len(table)
        k = 1 if fam == "quad4" else 2
        s = k + 1
        K, tags = build_K(table, V, ambient)
        if ambient == 2:
            # orientation repair (planar only; surfaces keep gmsh orientation)
            for e in range(N):
                v1 = K[k, e] - K[0, e]           # along axis 1
                v2 = K[s * k, e] - K[0, e]       # along axis 2
                if v1[0] * v2[1] - v1[1] * v2[0] < 0:
                    perm = _flip_axis1(list(range(V)), s, 2)
                    K[:, e] = K[perm, e]
                    tags[:, e] = tags[perm, e]
        _, t = _dedup_tags(tags)
        geom = fem2d(K=K, k=k, t=t, ambient=ambient, dtype=dtype)
        Vn = V
    elif fam in ("hex8", "hex27"):
        table = _HEX8 if fam == "hex8" else _HEX27
        k = 1 if fam == "hex8" else 2
        s = k + 1
        V = len(table)
        K, tags = build_K(table, V, 3)
        for e in range(N):
            v1 = K[k, e] - K[0, e]
            v2 = K[s * k, e] - K[0, e]
            v3 = K[s * s * k, e] - K[0, e]
            if np.linalg.det(np.stack([v1, v2, v3])) < 0:
                perm = _flip_axis1(list(range(V)), s, 3)
                K[:, e] = K[perm, e]
                tags[:, e] = tags[perm, e]
        _, t = _dedup_tags(tags)
        geom = fem3d(K=K, k=k, t=t, dtype=dtype)
        Vn = V
    else:  # line/point-only mesh
        raise ValueError("gmsh_import: mesh has no 2D/3D elements")

    # physical groups -> (v, e) pairs by node-tag membership
    group_tags: dict = {}
    for etype, phys, conn in elements:
        for pid in phys:
            gd = _TYPES[etype][2]
            name = physnames.get((gd, pid), f"dim{gd}_{pid}")
            group_tags.setdefault(name, set()).update(conn)
    regions = {}
    for name, tset in group_tags.items():
        pairs = [(v, e) for e in range(N) for v in range(Vn)
                 if int(tags[v, e]) in tset]
        regions[name] = pairs
    return SimpleNamespace(geometry=geom, regions=regions)


def _dedup_tags(tags: np.ndarray):
    """Connectivity from exact gmsh node tags (0-based first-occurrence)."""
    flat = tags.reshape(-1, order="F")
    remap: dict = {}
    out = np.empty_like(flat)
    for i, tg in enumerate(flat):
        tg = int(tg)
        if tg not in remap:
            remap[tg] = len(remap)
        out[i] = remap[tg]
    return len(remap), out.reshape(tags.shape, order="F")
