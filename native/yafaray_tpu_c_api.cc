/* Native C API implementation.
 *
 * Mirrors the reference's L0/L1 layers (src/public_api/yafaray_c_api.cc +
 * src/interface/interface.cc): an opaque session object staging typed
 * parameters and geometry in C++ containers, then driving the JAX compute
 * core through an embedded CPython interpreter. Geometry is staged in
 * std::vector (no Python overhead per vertex) and handed to the scene
 * builder in ONE bulk call as numpy arrays built from the raw buffers.
 *
 * Export interface types reuse the Python-side recorders (io/export.py),
 * matching the reference's ExportXml/ExportC/ExportPython dispatch
 * (yafaray_c_api.cc:32).
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <array>
#include <cstring>
#include <map>
#include <string>
#include <variant>
#include <vector>

#include "include/yafaray_tpu_c_api.h"

namespace {

using ParamValue = std::variant<bool, int, double, std::string,
                                std::array<double, 3>, std::array<double, 4>,
                                std::array<double, 16>>;
using ParamMap = std::vector<std::pair<std::string, ParamValue>>;

PyObject *paramValueToPy(const ParamValue &v) {
  if (auto *b = std::get_if<bool>(&v)) return PyBool_FromLong(*b);
  if (auto *i = std::get_if<int>(&v)) return PyLong_FromLong(*i);
  if (auto *d = std::get_if<double>(&v)) return PyFloat_FromDouble(*d);
  if (auto *s = std::get_if<std::string>(&v))
    return PyUnicode_FromString(s->c_str());
  if (auto *v3 = std::get_if<std::array<double, 3>>(&v)) {
    PyObject *t = PyTuple_New(3);
    for (int k = 0; k < 3; ++k)
      PyTuple_SET_ITEM(t, k, PyFloat_FromDouble((*v3)[k]));
    return t;
  }
  if (auto *v4 = std::get_if<std::array<double, 4>>(&v)) {
    PyObject *t = PyTuple_New(4);
    for (int k = 0; k < 4; ++k)
      PyTuple_SET_ITEM(t, k, PyFloat_FromDouble((*v4)[k]));
    return t;
  }
  if (auto *m = std::get_if<std::array<double, 16>>(&v)) {
    PyObject *t = PyTuple_New(16);
    for (int k = 0; k < 16; ++k)
      PyTuple_SET_ITEM(t, k, PyFloat_FromDouble((*m)[k]));
    return t;
  }
  Py_RETURN_NONE;
}

PyObject *paramMapToDict(const ParamMap &pm) {
  PyObject *d = PyDict_New();
  for (const auto &kv : pm) {
    PyObject *v = paramValueToPy(kv.second);
    PyDict_SetItemString(d, kv.first.c_str(), v);
    Py_DECREF(v);
  }
  return d;
}

struct StagedObject {
  std::string name;
  ParamMap params;
  std::vector<float> vertices;   // xyz triples
  std::vector<float> normals;
  std::vector<float> uvs;        // uv pairs
  std::vector<int> faces;        // abc triples
  std::vector<int> face_uvs;     // uv index triples (-1 if none)
  std::vector<int> face_mats;
};

void ensurePython() {
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
  }
}

}  // namespace

struct yafaray_Interface {
  yafaray_InterfaceType_t type = YAFARAY_INTERFACE_FOR_RENDERING;
  std::string export_path;
  ParamMap params;
  std::vector<ParamMap> param_list;  // paramsPushList shader-node stacks
  bool in_list = false;
  std::string current_material;

  // staged entities, replayed into the Python SceneBuilder at setup
  std::vector<std::pair<std::string, ParamMap>> textures, materials, lights,
      cameras, volumes, views;
  std::map<std::string, std::vector<ParamMap>> material_nodes;
  ParamMap background;
  bool has_background = false;
  ParamMap render_params;
  std::vector<StagedObject> objects;
  std::vector<std::pair<std::string, std::array<double, 16>>> instances;

  PyObject *builder = nullptr;  // SceneBuilder instance (after setup)
  PyObject *image = nullptr;    // numpy [H,W,4] float32 of the last render
  int resx = 0, resy = 0;
  bool canceled = false;
  yafaray_LoggerCallback_t logger_cb = nullptr;
  void *logger_data = nullptr;

  StagedObject *cur_obj() {
    return objects.empty() ? nullptr : &objects.back();
  }
  int matIndex(const std::string &name) {
    for (size_t i = 0; i < materials.size(); ++i)
      if (materials[i].first == name) return static_cast<int>(i);
    return 0;
  }
};

extern "C" {

yafaray_Interface_t *yafaray_createInterface(yafaray_InterfaceType_t type,
                                             const char *export_path,
                                             yafaray_LoggerCallback_t logger,
                                             void *logger_data,
                                             int /*console_verbosity*/) {
  auto *yi = new yafaray_Interface();
  yi->type = type;
  if (export_path) yi->export_path = export_path;
  yi->logger_cb = logger;
  yi->logger_data = logger_data;
  return yi;
}

void yafaray_destroyInterface(yafaray_Interface_t *yi) {
  if (yi->builder || yi->image) {
    ensurePython();
    PyGILState_STATE g = PyGILState_Ensure();
    Py_XDECREF(yi->builder);
    Py_XDECREF(yi->image);
    PyGILState_Release(g);
  }
  delete yi;
}

void yafaray_paramsClearAll(yafaray_Interface_t *yi) {
  yi->params.clear();
  yi->param_list.clear();
  yi->in_list = false;
}

static ParamMap &target(yafaray_Interface_t *yi) {
  return yi->in_list ? yi->param_list.back() : yi->params;
}

void yafaray_paramsSetBool(yafaray_Interface_t *yi, const char *n,
                           yafaray_Bool_t v) {
  target(yi).emplace_back(n, v == YAFARAY_BOOL_TRUE);
}
void yafaray_paramsSetInt(yafaray_Interface_t *yi, const char *n, int v) {
  target(yi).emplace_back(n, v);
}
void yafaray_paramsSetFloat(yafaray_Interface_t *yi, const char *n,
                            double v) {
  target(yi).emplace_back(n, v);
}
void yafaray_paramsSetString(yafaray_Interface_t *yi, const char *n,
                             const char *v) {
  target(yi).emplace_back(n, std::string(v));
}
void yafaray_paramsSetVector(yafaray_Interface_t *yi, const char *n, double x,
                             double y, double z) {
  target(yi).emplace_back(n, std::array<double, 3>{x, y, z});
}
void yafaray_paramsSetColor(yafaray_Interface_t *yi, const char *n, double r,
                            double g, double b, double a) {
  target(yi).emplace_back(n, std::array<double, 4>{r, g, b, a});
}
void yafaray_paramsSetMatrix(yafaray_Interface_t *yi, const char *n,
                             const double m[4][4]) {
  std::array<double, 16> flat;
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) flat[i * 4 + j] = m[i][j];
  target(yi).emplace_back(n, flat);
}
void yafaray_paramsPushList(yafaray_Interface_t *yi) {
  yi->param_list.emplace_back();
  yi->in_list = true;
}
void yafaray_paramsEndList(yafaray_Interface_t *yi) { yi->in_list = false; }

int yafaray_createScene(yafaray_Interface_t *) { return 1; }

int yafaray_createMaterial(yafaray_Interface_t *yi, const char *name) {
  yi->materials.emplace_back(name, yi->params);
  if (!yi->param_list.empty())
    yi->material_nodes[name] = yi->param_list;
  yafaray_paramsClearAll(yi);
  return 1;
}
int yafaray_createTexture(yafaray_Interface_t *yi, const char *name) {
  yi->textures.emplace_back(name, yi->params);
  yafaray_paramsClearAll(yi);
  return 1;
}
int yafaray_createLight(yafaray_Interface_t *yi, const char *name) {
  yi->lights.emplace_back(name, yi->params);
  yafaray_paramsClearAll(yi);
  return 1;
}
int yafaray_createCamera(yafaray_Interface_t *yi, const char *name) {
  yi->cameras.emplace_back(name, yi->params);
  yafaray_paramsClearAll(yi);
  return 1;
}
int yafaray_defineBackground(yafaray_Interface_t *yi) {
  yi->background = yi->params;
  yi->has_background = true;
  yafaray_paramsClearAll(yi);
  return 1;
}
int yafaray_createVolumeRegion(yafaray_Interface_t *yi, const char *name) {
  yi->volumes.emplace_back(name, yi->params);
  yafaray_paramsClearAll(yi);
  return 1;
}
int yafaray_createRenderView(yafaray_Interface_t *yi, const char *name) {
  yi->views.emplace_back(name, yi->params);
  yafaray_paramsClearAll(yi);
  return 1;
}

int yafaray_createObject(yafaray_Interface_t *yi, const char *name) {
  StagedObject obj;
  obj.name = name;
  obj.params = yi->params;
  yi->objects.push_back(std::move(obj));
  yafaray_paramsClearAll(yi);
  return static_cast<int>(yi->objects.size() - 1);
}

int yafaray_addVertex(yafaray_Interface_t *yi, double x, double y, double z) {
  auto *o = yi->cur_obj();
  if (!o) return -1;
  o->vertices.push_back(static_cast<float>(x));
  o->vertices.push_back(static_cast<float>(y));
  o->vertices.push_back(static_cast<float>(z));
  return static_cast<int>(o->vertices.size() / 3 - 1);
}
void yafaray_addNormal(yafaray_Interface_t *yi, double x, double y,
                       double z) {
  auto *o = yi->cur_obj();
  if (!o) return;
  o->normals.push_back(static_cast<float>(x));
  o->normals.push_back(static_cast<float>(y));
  o->normals.push_back(static_cast<float>(z));
}
int yafaray_addUv(yafaray_Interface_t *yi, double u, double v) {
  auto *o = yi->cur_obj();
  if (!o) return -1;
  o->uvs.push_back(static_cast<float>(u));
  o->uvs.push_back(static_cast<float>(v));
  return static_cast<int>(o->uvs.size() / 2 - 1);
}
int yafaray_addTriangle(yafaray_Interface_t *yi, int a, int b, int c) {
  return yafaray_addTriangleWithUv(yi, a, b, c, -1, -1, -1);
}
int yafaray_addTriangleWithUv(yafaray_Interface_t *yi, int a, int b, int c,
                              int uv_a, int uv_b, int uv_c) {
  auto *o = yi->cur_obj();
  if (!o) return -1;
  o->faces.insert(o->faces.end(), {a, b, c});
  o->face_uvs.insert(o->face_uvs.end(), {uv_a, uv_b, uv_c});
  o->face_mats.push_back(yi->matIndex(yi->current_material));
  return static_cast<int>(o->faces.size() / 3 - 1);
}
void yafaray_setCurrentMaterial(yafaray_Interface_t *yi, const char *name) {
  yi->current_material = name;
}
void yafaray_smoothMesh(yafaray_Interface_t *yi, const char *name,
                        double angle) {
  ParamMap &rp = yi->render_params;
  (void)rp;
  for (auto &o : yi->objects)
    if (o.name == name || std::strlen(name) == 0)
      o.params.emplace_back("__smooth__", angle);
}
int yafaray_addInstance(yafaray_Interface_t *yi, const char *base,
                        const double m[4][4]) {
  std::array<double, 16> flat;
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) flat[i * 4 + j] = m[i][j];
  yi->instances.emplace_back(base, flat);
  return 1;
}

/* Build the Python SceneBuilder from the staged state. */
static bool buildScene(yafaray_Interface_t *yi) {
  ensurePython();
  PyGILState_STATE g = PyGILState_Ensure();
  bool ok = false;
  PyObject *mod = nullptr, *np = nullptr;
  do {
    mod = PyImport_ImportModule("libyafaray_tpu");
    if (!mod) break;
    np = PyImport_ImportModule("numpy");
    if (!np) break;
    PyObject *cls = PyObject_GetAttrString(mod, "SceneBuilder");
    if (!cls) break;
    Py_XDECREF(yi->builder);
    yi->builder = PyObject_CallObject(cls, nullptr);
    Py_DECREF(cls);
    if (!yi->builder) break;

    auto call = [&](const char *method, PyObject *args) -> PyObject * {
      PyObject *m = PyObject_GetAttrString(yi->builder, method);
      if (!m) return nullptr;
      PyObject *r = PyObject_CallObject(m, args);
      Py_DECREF(m);
      Py_XDECREF(args);
      return r;
    };
    auto entity = [&](const char *method, const std::string &name,
                      const ParamMap &pm) -> bool {
      PyObject *d = paramMapToDict(pm);
      PyObject *args = Py_BuildValue("(sO)", name.c_str(), d);
      Py_DECREF(d);
      PyObject *r = call(method, args);
      if (!r) return false;
      Py_DECREF(r);
      return true;
    };

    bool fail = false;
    for (auto &t : yi->textures)
      fail |= !entity("create_texture", t.first, t.second);
    for (auto &m : yi->materials) {
      PyObject *d = paramMapToDict(m.second);
      PyObject *nodes = nullptr;
      auto it = yi->material_nodes.find(m.first);
      if (it != yi->material_nodes.end()) {
        nodes = PyList_New(it->second.size());
        for (size_t k = 0; k < it->second.size(); ++k)
          PyList_SET_ITEM(nodes, k, paramMapToDict(it->second[k]));
      } else {
        nodes = Py_None;
        Py_INCREF(Py_None);
      }
      PyObject *args = Py_BuildValue("(sOO)", m.first.c_str(), d, nodes);
      Py_DECREF(d);
      Py_DECREF(nodes);
      PyObject *r = call("create_material", args);
      if (!r) fail = true; else Py_DECREF(r);
    }
    for (auto &l : yi->lights) fail |= !entity("create_light", l.first,
                                               l.second);
    for (auto &c : yi->cameras) fail |= !entity("create_camera", c.first,
                                                c.second);
    if (yi->has_background) {
      PyObject *d = paramMapToDict(yi->background);
      PyObject *r = call("create_background", Py_BuildValue("(O)", d));
      Py_DECREF(d);
      if (!r) fail = true; else Py_DECREF(r);
    }
    for (auto &v : yi->volumes)
      fail |= !entity("create_volume_region", v.first, v.second);
    for (auto &v : yi->views)
      fail |= !entity("create_render_view", v.first, v.second);

    for (auto &o : yi->objects) {
      double smooth_angle = -1.0;
      ParamMap cleaned;
      for (auto &kv : o.params) {
        if (kv.first == "__smooth__")
          smooth_angle = std::get<double>(kv.second);
        else
          cleaned.push_back(kv);
      }
      if (!entity("create_object", o.name, cleaned)) { fail = true; break; }
      if (o.faces.empty()) continue;
      /* zero-copy views over the C++ buffers -> one bulk call */
      PyObject *vb = PyMemoryView_FromMemory(
          reinterpret_cast<char *>(o.vertices.data()),
          o.vertices.size() * sizeof(float), PyBUF_READ);
      PyObject *fb = PyMemoryView_FromMemory(
          reinterpret_cast<char *>(o.faces.data()),
          o.faces.size() * sizeof(int), PyBUF_READ);
      PyObject *fub = PyMemoryView_FromMemory(
          reinterpret_cast<char *>(o.face_uvs.data()),
          o.face_uvs.size() * sizeof(int), PyBUF_READ);
      PyObject *fmb = PyMemoryView_FromMemory(
          reinterpret_cast<char *>(o.face_mats.data()),
          o.face_mats.size() * sizeof(int), PyBUF_READ);
      PyObject *frombuffer = PyObject_GetAttrString(np, "frombuffer");
      PyObject *verts = PyObject_CallFunction(frombuffer, "Os", vb, "float32");
      PyObject *faces = PyObject_CallFunction(frombuffer, "Os", fb, "int32");
      PyObject *fuvs = PyObject_CallFunction(frombuffer, "Os", fub, "int32");
      PyObject *fmats = PyObject_CallFunction(frombuffer, "Os", fmb, "int32");
      PyObject *uvs = Py_None, *norms = Py_None;
      Py_INCREF(Py_None); Py_INCREF(Py_None);
      if (!o.uvs.empty()) {
        PyObject *ub = PyMemoryView_FromMemory(
            reinterpret_cast<char *>(
                const_cast<float *>(o.uvs.data())),
            o.uvs.size() * sizeof(float), PyBUF_READ);
        Py_DECREF(uvs);
        uvs = PyObject_CallFunction(frombuffer, "Os", ub, "float32");
        Py_DECREF(ub);
      }
      if (!o.normals.empty()) {
        PyObject *nb = PyMemoryView_FromMemory(
            reinterpret_cast<char *>(
                const_cast<float *>(o.normals.data())),
            o.normals.size() * sizeof(float), PyBUF_READ);
        Py_DECREF(norms);
        norms = PyObject_CallFunction(frombuffer, "Os", nb, "float32");
        Py_DECREF(nb);
      }
      Py_DECREF(frombuffer);
      PyObject *args = Py_BuildValue("(OOOOOO)", verts, faces, uvs, fuvs,
                                     norms, fmats);
      PyObject *r = call("add_mesh_arrays", args);
      for (PyObject *p : {vb, fb, fub, fmb, verts, faces, fuvs, fmats, uvs,
                          norms})
        Py_XDECREF(p);
      if (!r) { fail = true; break; }
      Py_DECREF(r);
      if (smooth_angle >= 0.0) {
        PyObject *r2 = call("smooth_mesh",
                            Py_BuildValue("(sd)", o.name.c_str(),
                                          smooth_angle));
        if (!r2) { fail = true; break; }
        Py_DECREF(r2);
      }
    }
    for (auto &inst : yi->instances) {
      PyObject *mtx = PyTuple_New(16);
      for (int k = 0; k < 16; ++k)
        PyTuple_SET_ITEM(mtx, k, PyFloat_FromDouble(inst.second[k]));
      PyObject *r = call("add_instance",
                         Py_BuildValue("(sO)", inst.first.c_str(), mtx));
      Py_DECREF(mtx);
      if (!r) { fail = true; break; }
      Py_DECREF(r);
    }
    if (!yi->render_params.empty()) {
      PyObject *d = paramMapToDict(yi->render_params);
      PyObject *r = call("set_render_params", Py_BuildValue("(O)", d));
      Py_DECREF(d);
      if (!r) fail = true; else Py_DECREF(r);
    }
    ok = !fail;
  } while (false);
  if (PyErr_Occurred()) PyErr_Print();
  Py_XDECREF(mod);
  Py_XDECREF(np);
  PyGILState_Release(g);
  return ok;
}

int yafaray_setupRender(yafaray_Interface_t *yi) {
  /* stage render params; actual compile happens in yafaray_render */
  yi->render_params = yi->params;
  yafaray_paramsClearAll(yi);
  return 1;
}

int yafaray_render(yafaray_Interface_t *yi,
                   yafaray_ProgressCallback_t progress, void *progress_data,
                   int /*display_console*/) {
  if (yi->type != YAFARAY_INTERFACE_FOR_RENDERING) {
    /* export interfaces delegate to the Python recorders */
    if (!buildScene(yi)) return 0;
    PyGILState_STATE g = PyGILState_Ensure();
    const char *fn = yi->type == YAFARAY_INTERFACE_EXPORT_XML
                         ? "export_xml"
                         : yi->type == YAFARAY_INTERFACE_EXPORT_C
                               ? "export_c"
                               : "export_python";
    PyObject *mod = PyImport_ImportModule("libyafaray_tpu.io.export");
    int ok = 0;
    if (mod) {
      PyObject *r = PyObject_CallMethod(mod, fn, "Os", yi->builder,
                                        yi->export_path.c_str());
      if (r) { ok = 1; Py_DECREF(r); }
      Py_DECREF(mod);
    }
    if (PyErr_Occurred()) PyErr_Print();
    PyGILState_Release(g);
    return ok;
  }
  if (!buildScene(yi)) return 0;
  PyGILState_STATE g = PyGILState_Ensure();
  int ok = 0;
  do {
    PyObject *helper = PyImport_ImportModule("libyafaray_tpu.capi_runtime");
    if (!helper) break;
    PyObject *rp = paramMapToDict(yi->render_params);
    PyObject *r = PyObject_CallMethod(helper, "render_for_capi", "OO",
                                      yi->builder, rp);
    Py_DECREF(rp);
    Py_DECREF(helper);
    if (!r) break;
    /* r = (image_ndarray_float32_rgba, resx, resy) */
    PyObject *img = PyTuple_GetItem(r, 0);
    yi->resx = static_cast<int>(PyLong_AsLong(PyTuple_GetItem(r, 1)));
    yi->resy = static_cast<int>(PyLong_AsLong(PyTuple_GetItem(r, 2)));
    Py_INCREF(img);
    Py_XDECREF(yi->image);
    yi->image = img;
    Py_DECREF(r);
    ok = 1;
    if (progress) progress(1, 1, "done", progress_data);
  } while (false);
  if (PyErr_Occurred()) PyErr_Print();
  PyGILState_Release(g);
  return ok;
}

void yafaray_cancelRendering(yafaray_Interface_t *yi) { yi->canceled = true; }

int yafaray_saveImage(yafaray_Interface_t *yi, const char *path) {
  if (!yi->image) return 0;
  PyGILState_STATE g = PyGILState_Ensure();
  int ok = 0;
  PyObject *mod = PyImport_ImportModule("libyafaray_tpu.io");
  if (mod) {
    PyObject *r = PyObject_CallMethod(mod, "save_image", "sO", path,
                                      yi->image);
    if (r) { ok = 1; Py_DECREF(r); }
    Py_DECREF(mod);
  }
  if (PyErr_Occurred()) PyErr_Print();
  PyGILState_Release(g);
  return ok;
}

int yafaray_getImage(yafaray_Interface_t *yi, float *out, size_t capacity) {
  if (!yi->image) return 0;
  PyGILState_STATE g = PyGILState_Ensure();
  int result = 0;
  PyObject *bytes = PyObject_CallMethod(yi->image, "tobytes", nullptr);
  if (bytes) {
    char *buf = nullptr;
    Py_ssize_t len = 0;
    if (PyBytes_AsStringAndSize(bytes, &buf, &len) == 0 &&
        static_cast<size_t>(len) <= capacity * sizeof(float)) {
      std::memcpy(out, buf, len);
      result = (yi->resx << 16) | yi->resy;
    }
    Py_DECREF(bytes);
  }
  if (PyErr_Occurred()) PyErr_Print();
  PyGILState_Release(g);
  return result;
}

void yafaray_setConsoleVerbosityLevel(yafaray_Interface_t *,
                                      yafaray_LogLevel_t) {}

const char *yafaray_getVersionString(void) { return "libyafaray_tpu 0.1.0"; }

}  // extern "C"
