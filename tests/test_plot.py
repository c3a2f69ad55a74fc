

def test_plot3d_html(tmp_path):
    """Self-contained interactive HTML export (the PyVista-role viewer):
    valid structure for triangle, quad-tensor and 3D-shell geometries."""
    import re

    from mgbtpu import (amg, assemble, fem2d, fem2d_P2, fem3d, mgb_solve,
                        plot3d_html, subdivide)

    sols = [
        mgb_solve(assemble(amg(subdivide(fem2d_P2(), 1)), p=2.0), tol=1e-4),
        mgb_solve(assemble(amg(subdivide(fem2d(k=2), 1)), p=2.0), tol=1e-4),
        mgb_solve(assemble(amg(fem3d(k=1)), p=2.0), tol=1e-3),
    ]
    for i, sol in enumerate(sols):
        p = plot3d_html(sol, str(tmp_path / f"v{i}.html"))
        s = open(p).read()
        m = re.search(r"<script>(.*)</script>", s, re.S)
        js = m.group(1)
        for a, b in (("(", ")"), ("{", "}"), ("[", "]")):
            assert js.count(a) == js.count(b)
        assert '"v":' in s and '"t":' in s and '"c":' in s
