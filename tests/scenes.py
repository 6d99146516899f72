"""Shared test scenes — the analogue of the reference's tests/test00 C client
scene (a Cornell-style box) built through the SceneBuilder API."""
import numpy as np

from libyafaray_tpu import SceneBuilder


def cornell_builder(white_emit=12.0, light_kind="area", extras=()):
    """Cornell box: floor/ceiling/back/left(red)/right(green) + 2 boxes +
    an area light (or point light)."""
    b = SceneBuilder()
    b.create_material("white", {"type": "shinydiffusemat",
                                "color": (0.73, 0.73, 0.73)})
    b.create_material("red", {"type": "shinydiffusemat",
                              "color": (0.65, 0.05, 0.05)})
    b.create_material("green", {"type": "shinydiffusemat",
                                "color": (0.12, 0.45, 0.15)})
    for name, pm in extras:
        b.create_material(name, pm)

    b.create_object("walls")

    def quad(mat, p0, p1, p2, p3):
        b.set_current_material(mat)
        i0 = b.add_vertex(*p0)
        i1 = b.add_vertex(*p1)
        i2 = b.add_vertex(*p2)
        i3 = b.add_vertex(*p3)
        b.add_quad(i0, i1, i2, i3)

    # box [0,1]^3, camera looks +y, z up
    quad("white", (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0))          # floor
    quad("white", (0, 0, 1), (0, 1, 1), (1, 1, 1), (1, 0, 1))          # ceiling
    quad("white", (0, 1, 0), (1, 1, 0), (1, 1, 1), (0, 1, 1))          # back
    quad("red", (0, 0, 0), (0, 1, 0), (0, 1, 1), (0, 0, 1))            # left
    quad("green", (1, 0, 0), (1, 0, 1), (1, 1, 1), (1, 1, 0))          # right

    # short box
    b.create_object("box1")
    b.set_current_material("white")
    _box(b, (0.55, 0.45, 0.0), (0.30, 0.30, 0.30), rot=-0.30)
    # tall box
    b.create_object("box2")
    b.set_current_material("white")
    _box(b, (0.15, 0.6, 0.0), (0.30, 0.30, 0.60), rot=0.35)

    if light_kind == "area":
        b.create_light("lamp", {
            "type": "arealight",
            # emitting normal is cross(e1,e2) (reference light_area.cc:40-45
            # normal_ = -(to_y^to_x)); this ordering points it down into the box
            "corner": (0.35, 0.35, 0.999), "point1": (0.35, 0.65, 0.999),
            "point2": (0.65, 0.35, 0.999),
            "color": (1.0, 0.9, 0.8), "power": white_emit, "samples": 1})
    else:
        b.create_light("lamp", {"type": "pointlight", "from": (0.5, 0.5, 0.9),
                                "color": (1.0, 0.9, 0.8),
                                "power": white_emit / 12.0})

    b.create_camera("cam", {"type": "perspective",
                            "from": (0.5, -1.35, 0.5), "to": (0.5, 0.5, 0.5),
                            "up": (0.5, -1.35, 1.5),
                            "resx": 64, "resy": 64, "fov": 39.0})
    b.create_background({"type": "constant", "color": (0, 0, 0)})
    return b


def _box(b, origin, size, rot=0.0):
    ox, oy, oz = origin
    sx, sy, sz = size
    c, s = np.cos(rot), np.sin(rot)
    cx, cy = ox + sx / 2, oy + sy / 2

    def v(x, y, z):
        rx = cx + (x - cx) * c - (y - cy) * s
        ry = cy + (x - cx) * s + (y - cy) * c
        return b.add_vertex(rx, ry, z)

    p = [v(ox, oy, oz), v(ox + sx, oy, oz), v(ox + sx, oy + sy, oz),
         v(ox, oy + sy, oz), v(ox, oy, oz + sz), v(ox + sx, oy, oz + sz),
         v(ox + sx, oy + sy, oz + sz), v(ox, oy + sy, oz + sz)]
    b.add_quad(p[0], p[1], p[5], p[4])
    b.add_quad(p[1], p[2], p[6], p[5])
    b.add_quad(p[2], p[3], p[7], p[6])
    b.add_quad(p[3], p[0], p[4], p[7])
    b.add_quad(p[4], p[5], p[6], p[7])  # top
    b.add_quad(p[3], p[2], p[1], p[0])  # bottom


def bigmesh_builder(res=320, textured=True):
    """BASELINE.md config 3: ~200k-triangle displaced terrain grid with a
    textured diffuse material and an environment background (2*(res-1)^2
    triangles; res=320 -> 203,522)."""
    b = SceneBuilder()
    if textured:
        tex = (np.indices((64, 64)).sum(0) % 16 / 15.0).astype(np.float32)
        img = np.stack([tex, 0.8 * tex + 0.1, 1.0 - tex], -1)
        b.create_texture("checker", {"type": "image"}, image=img)
        b.create_material(
            "ground",
            {"type": "shinydiffusemat", "color": (0.6, 0.55, 0.5),
             "diffuse_shader": "diff"},
            node_list=[{"name": "diff", "type": "texture_mapper",
                        "texture": "checker", "texco": "uv"}])
    else:
        b.create_material("ground", {"type": "shinydiffusemat",
                                     "color": (0.6, 0.55, 0.5)})
    b.create_object("terrain")
    b.set_current_material("ground")
    xs = np.linspace(0.0, 4.0, res, dtype=np.float32)
    ys = np.linspace(0.0, 4.0, res, dtype=np.float32)
    xx, yy = np.meshgrid(xs, ys, indexing="ij")
    zz = (0.35 * np.sin(xx * 2.3) * np.cos(yy * 1.7)
          + 0.12 * np.sin(xx * 9.1 + 1.0) * np.sin(yy * 8.3)
          + 0.04 * np.sin(xx * 31.0) * np.cos(yy * 29.0)).astype(np.float32)
    verts = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
    i = np.arange(res * res).reshape(res, res)
    a = i[:-1, :-1].ravel(); b2 = i[1:, :-1].ravel()
    c = i[1:, 1:].ravel(); d2 = i[:-1, 1:].ravel()
    faces = np.concatenate([np.stack([a, b2, c], -1),
                            np.stack([a, c, d2], -1)]).astype(np.int32)
    uvs = np.stack([xx / 4.0, yy / 4.0], axis=-1).reshape(-1, 2) \
        if textured else None
    b.add_mesh_arrays(verts, faces,
                      uvs=uvs.astype(np.float32) if textured else None,
                      face_uvs=faces if textured else None)
    b.create_light("sun", {"type": "sunlight", "direction": (0.3, 0.3, 0.8),
                           "color": (1.0, 1.0, 0.95), "power": 1.0})
    b.create_camera("cam", {"type": "perspective",
                            "from": (2.0, -2.5, 2.2), "to": (2.0, 2.0, 0.0),
                            "up": (2.0, -2.5, 3.2),
                            "resx": 720, "resy": 720, "fov": 55.0})
    b.create_background({"type": "constant", "color": (0.3, 0.4, 0.6),
                         "ibl": True, "ibl_samples": 2})
    return b


def glossy_cornell_builder():
    """BASELINE.md config 2: Cornell with a glossy box + diffuse walls."""
    b = cornell_builder(extras=[
        ("gloss", {"type": "glossy", "color": (0.7, 0.6, 0.3),
                   "glossy_reflect": 0.8, "exponent": 120.0})])
    return b


def volume_emissive_builder():
    """BASELINE.md config 5: homogeneous scattering volume + emissive mesh."""
    b = cornell_builder(white_emit=6.0)
    b.create_material("emit", {"type": "light_mat", "color": (1.0, 0.7, 0.4),
                               "power": 4.0})
    b.create_object("glow")
    b.set_current_material("emit")
    i0 = b.add_vertex(0.4, 0.5, 0.35)
    i1 = b.add_vertex(0.6, 0.5, 0.35)
    i2 = b.add_vertex(0.5, 0.5, 0.55)
    b.add_triangle(i0, i1, i2)
    b.create_light("glowl", {"type": "meshlight", "object_name": "glow",
                             "color": (1.0, 0.7, 0.4), "power": 4.0,
                             "samples": 1})
    b.create_volume_region("fog", {"type": "UniformVolume", "sigma_s": 0.25,
                            "sigma_a": 0.05, "g": 0.0,
                            "minX": 0.0, "maxX": 1.0, "minY": 0.0,
                            "maxY": 1.0, "minZ": 0.0, "maxZ": 1.0})
    return b


def caustic_grad_builder(resx=512, resy=512):
    """BASELINE.md config 4: Cornell + glass box over a textured floor
    plane — dielectric caustic paths with gradients w.r.t. IOR and the
    floor texture's texels."""
    b = cornell_builder(extras=[
        ("glass", {"type": "glass", "IOR": 1.5,
                   "filter_color": (0.97, 0.97, 0.97)})])
    tex = (np.indices((32, 32)).sum(0) % 8 / 7.0).astype(np.float32)
    img = np.stack([0.2 + 0.6 * tex, 0.5 * tex + 0.2, 0.9 - 0.5 * tex], -1)
    b.create_texture("floor_tex", {"type": "image"}, image=img)
    b.create_material(
        "floor_mat",
        {"type": "shinydiffusemat", "color": (1, 1, 1),
         "diffuse_shader": "diff"},
        node_list=[{"name": "diff", "type": "texture_mapper",
                    "texture": "floor_tex", "texco": "uv"}])
    b.create_object("floor_plane")
    b.set_current_material("floor_mat")
    z = 0.002
    verts = np.asarray([[0, 0, z], [1, 0, z], [1, 1, z], [0, 1, z]],
                       np.float32)
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = verts[:, :2].copy()
    b.add_mesh_arrays(verts, faces, uvs=uvs, face_uvs=faces)
    b.create_object("glassbox")
    b.set_current_material("glass")
    _box(b, (0.35, 0.35, 0.15), (0.3, 0.25, 0.35))
    b.cameras["cam"]["resx"] = resx
    b.cameras["cam"]["resy"] = resy
    return b
