/* yafaray_tpu C public API.
 *
 * The stable extern "C" surface of the TPU-native framework, mirroring the
 * reference's include/public_api/yafaray_c_api.h:31-130 (opaque interface
 * handle, typed parameter staging, geometry streaming, entity factories,
 * render + callbacks). The implementation (yafaray_tpu_c_api.cc) stages
 * parameters and geometry in native C++ buffers and drives the Python/JAX
 * compute core through an embedded interpreter; geometry crosses the
 * boundary zero-copy as numpy views over the C++ vectors.
 */
#ifndef YAFARAY_TPU_C_API_H
#define YAFARAY_TPU_C_API_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct yafaray_Interface yafaray_Interface_t;

typedef enum {
  YAFARAY_INTERFACE_FOR_RENDERING = 0,
  YAFARAY_INTERFACE_EXPORT_XML = 1,
  YAFARAY_INTERFACE_EXPORT_C = 2,
  YAFARAY_INTERFACE_EXPORT_PYTHON = 3,
} yafaray_InterfaceType_t;

typedef enum {
  YAFARAY_BOOL_FALSE = 0,
  YAFARAY_BOOL_TRUE = 1,
} yafaray_Bool_t;

typedef enum {
  YAFARAY_LOG_LEVEL_MUTE = 0,
  YAFARAY_LOG_LEVEL_ERROR = 1,
  YAFARAY_LOG_LEVEL_WARNING = 2,
  YAFARAY_LOG_LEVEL_PARAMS = 3,
  YAFARAY_LOG_LEVEL_INFO = 4,
  YAFARAY_LOG_LEVEL_VERBOSE = 5,
  YAFARAY_LOG_LEVEL_DEBUG = 6,
} yafaray_LogLevel_t;

typedef void (*yafaray_ProgressCallback_t)(int done, int total,
                                           const char *tag, void *data);
typedef void (*yafaray_LoggerCallback_t)(yafaray_LogLevel_t level,
                                         double time, const char *message,
                                         void *data);

/* --- lifecycle --- */
yafaray_Interface_t *yafaray_createInterface(
    yafaray_InterfaceType_t type, const char *export_path,
    yafaray_LoggerCallback_t logger, void *logger_data, int console_verbosity);
void yafaray_destroyInterface(yafaray_Interface_t *yi);

/* --- parameter staging (ParamMap analogue) --- */
void yafaray_paramsClearAll(yafaray_Interface_t *yi);
void yafaray_paramsSetBool(yafaray_Interface_t *yi, const char *name,
                           yafaray_Bool_t value);
void yafaray_paramsSetInt(yafaray_Interface_t *yi, const char *name,
                          int value);
void yafaray_paramsSetFloat(yafaray_Interface_t *yi, const char *name,
                            double value);
void yafaray_paramsSetString(yafaray_Interface_t *yi, const char *name,
                             const char *value);
void yafaray_paramsSetVector(yafaray_Interface_t *yi, const char *name,
                             double x, double y, double z);
void yafaray_paramsSetColor(yafaray_Interface_t *yi, const char *name,
                            double r, double g, double b, double a);
void yafaray_paramsSetMatrix(yafaray_Interface_t *yi, const char *name,
                             const double m[4][4]);
void yafaray_paramsPushList(yafaray_Interface_t *yi);
void yafaray_paramsEndList(yafaray_Interface_t *yi);

/* --- entity creation (factory dispatch by staged "type" param) --- */
int yafaray_createScene(yafaray_Interface_t *yi);
int yafaray_createMaterial(yafaray_Interface_t *yi, const char *name);
int yafaray_createTexture(yafaray_Interface_t *yi, const char *name);
int yafaray_createLight(yafaray_Interface_t *yi, const char *name);
int yafaray_createCamera(yafaray_Interface_t *yi, const char *name);
int yafaray_defineBackground(yafaray_Interface_t *yi);
int yafaray_createVolumeRegion(yafaray_Interface_t *yi, const char *name);
int yafaray_createRenderView(yafaray_Interface_t *yi, const char *name);

/* --- geometry streaming (native-buffer fast path) --- */
int yafaray_createObject(yafaray_Interface_t *yi, const char *name);
int yafaray_addVertex(yafaray_Interface_t *yi, double x, double y, double z);
void yafaray_addNormal(yafaray_Interface_t *yi, double x, double y, double z);
int yafaray_addUv(yafaray_Interface_t *yi, double u, double v);
int yafaray_addTriangle(yafaray_Interface_t *yi, int a, int b, int c);
int yafaray_addTriangleWithUv(yafaray_Interface_t *yi, int a, int b, int c,
                              int uv_a, int uv_b, int uv_c);
void yafaray_setCurrentMaterial(yafaray_Interface_t *yi, const char *name);
void yafaray_smoothMesh(yafaray_Interface_t *yi, const char *name,
                        double angle);
int yafaray_addInstance(yafaray_Interface_t *yi, const char *base_name,
                        const double m[4][4]);

/* --- render --- */
int yafaray_setupRender(yafaray_Interface_t *yi);
int yafaray_render(yafaray_Interface_t *yi,
                   yafaray_ProgressCallback_t progress, void *progress_data,
                   int display_console);
void yafaray_cancelRendering(yafaray_Interface_t *yi);

/* --- output --- */
int yafaray_saveImage(yafaray_Interface_t *yi, const char *path);
/* RGBA float32 pixel buffer of the last render (size resx*resy*4);
 * returns resx<<16|resy, or 0 if no render happened. */
int yafaray_getImage(yafaray_Interface_t *yi, float *out, size_t capacity);

/* --- misc --- */
void yafaray_setConsoleVerbosityLevel(yafaray_Interface_t *yi,
                                      yafaray_LogLevel_t level);
const char *yafaray_getVersionString(void);

#ifdef __cplusplus
}
#endif

#endif /* YAFARAY_TPU_C_API_H */
