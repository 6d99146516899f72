/* Fifth reference-parity golden: UNIFORM VOLUME single scattering — the
 * Cornell box filled with homogeneous fog, point light, directlighting
 * surface integrator + SingleScatterIntegrator volume integrator
 * (volintegrator_name render param). Pins the volume transmittance and
 * in-scatter estimators externally (point light -> deterministic light
 * sampling; the only noise is pixel jitter and march-step placement).
 *
 * Usage: volume_ref <out.hdr> [size] [spp]
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <yafaray_c_api.h>

static yafaray_Interface_t *yi;

static int v(double x, double y, double z) { return yafaray_addVertex(yi, x, y, z); }

static void quad(int a, int b, int c, int d)
{
	yafaray_addTriangle(yi, a, b, c);
	yafaray_addTriangle(yi, a, c, d);
}

static void material(const char *name, float r, float g, float b)
{
	yafaray_paramsSetString(yi, "type", "shinydiffusemat");
	yafaray_paramsSetColor(yi, "color", r, g, b, 1.f);
	yafaray_createMaterial(yi, name);
	yafaray_paramsClearAll(yi);
}

int main(int argc, char **argv)
{
	const char *out = argc > 1 ? argv[1] : "volume_ref.hdr";
	const int size = argc > 2 ? atoi(argv[2]) : 160;
	const int spp = argc > 3 ? atoi(argv[3]) : 128;

	yi = yafaray_createInterface(YAFARAY_INTERFACE_FOR_RENDERING, NULL, NULL,
								 NULL, YAFARAY_DISPLAY_CONSOLE_NORMAL);
	yafaray_setConsoleVerbosityLevel(yi, YAFARAY_LOG_LEVEL_WARNING);
	yafaray_createScene(yi);
	yafaray_paramsClearAll(yi);

	material("white", 0.73f, 0.73f, 0.73f);
	material("red", 0.65f, 0.05f, 0.05f);
	material("green", 0.12f, 0.45f, 0.15f);

	yafaray_startGeometry(yi);
	yafaray_paramsSetString(yi, "type", "mesh");
	yafaray_createObject(yi, "walls");
	yafaray_paramsClearAll(yi);
	yafaray_setCurrentMaterial(yi, "white");
	quad(v(0, 0, 0), v(1, 0, 0), v(1, 1, 0), v(0, 1, 0));
	quad(v(0, 0, 1), v(0, 1, 1), v(1, 1, 1), v(1, 0, 1));
	quad(v(0, 1, 0), v(1, 1, 0), v(1, 1, 1), v(0, 1, 1));
	yafaray_setCurrentMaterial(yi, "red");
	quad(v(0, 0, 0), v(0, 1, 0), v(0, 1, 1), v(0, 0, 1));
	yafaray_setCurrentMaterial(yi, "green");
	quad(v(1, 0, 0), v(1, 0, 1), v(1, 1, 1), v(1, 1, 0));
	yafaray_endGeometry(yi);

	yafaray_paramsSetString(yi, "type", "pointlight");
	yafaray_paramsSetColor(yi, "color", 1.f, 0.9f, 0.8f, 1.f);
	yafaray_paramsSetVector(yi, "from", 0.5, 0.5, 0.9);
	yafaray_paramsSetFloat(yi, "power", 1.0);
	yafaray_createLight(yi, "lamp");
	yafaray_paramsClearAll(yi);

	/* homogeneous fog over the box (volume_uniform.cc) */
	yafaray_paramsSetString(yi, "type", "UniformVolume");
	yafaray_paramsSetFloat(yi, "sigma_s", 0.4);
	yafaray_paramsSetFloat(yi, "sigma_a", 0.1);
	yafaray_paramsSetFloat(yi, "g", 0.0);
	yafaray_paramsSetFloat(yi, "minX", 0.0);
	yafaray_paramsSetFloat(yi, "maxX", 1.0);
	yafaray_paramsSetFloat(yi, "minY", 0.0);
	yafaray_paramsSetFloat(yi, "maxY", 1.0);
	yafaray_paramsSetFloat(yi, "minZ", 0.0);
	yafaray_paramsSetFloat(yi, "maxZ", 1.0);
	yafaray_createVolumeRegion(yi, "fog");
	yafaray_paramsClearAll(yi);

	yafaray_paramsSetString(yi, "type", "constant");
	yafaray_paramsSetColor(yi, "color", 0.f, 0.f, 0.f, 1.f);
	yafaray_createBackground(yi, "world_background");
	yafaray_paramsClearAll(yi);

	yafaray_paramsSetString(yi, "type", "perspective");
	yafaray_paramsSetInt(yi, "resx", size);
	yafaray_paramsSetInt(yi, "resy", size);
	yafaray_paramsSetFloat(yi, "focal", 0.5 / tan(0.5 * 39.0 * M_PI / 180.0));
	yafaray_paramsSetVector(yi, "from", 0.5, -1.35, 0.5);
	yafaray_paramsSetVector(yi, "to", 0.5, 0.5, 0.5);
	yafaray_paramsSetVector(yi, "up", 0.5, -1.35, 1.5);
	yafaray_createCamera(yi, "cam");
	yafaray_paramsClearAll(yi);

	yafaray_paramsSetString(yi, "camera_name", "cam");
	yafaray_createRenderView(yi, "view");
	yafaray_paramsClearAll(yi);

	yafaray_paramsSetString(yi, "image_path", out);
	yafaray_paramsSetString(yi, "color_space", "LinearRGB");
	yafaray_paramsSetFloat(yi, "gamma", 1.0);
	yafaray_createOutput(yi, "out_hdr");
	yafaray_paramsClearAll(yi);

	yafaray_paramsSetString(yi, "type", "directlighting");
	yafaray_createIntegrator(yi, "surfintegr");
	yafaray_paramsClearAll(yi);

	yafaray_paramsSetString(yi, "type", "SingleScatterIntegrator");
	yafaray_paramsSetFloat(yi, "stepSize", 0.05);
	yafaray_createIntegrator(yi, "volintegr");
	yafaray_paramsClearAll(yi);

	yafaray_paramsSetString(yi, "integrator_name", "surfintegr");
	yafaray_paramsSetString(yi, "volintegrator_name", "volintegr");
	yafaray_paramsSetString(yi, "scene_accelerator", "yafaray-kdtree-original");
	yafaray_paramsSetString(yi, "background_name", "world_background");
	yafaray_paramsSetInt(yi, "width", size);
	yafaray_paramsSetInt(yi, "height", size);
	yafaray_paramsSetInt(yi, "AA_minsamples", spp);
	yafaray_paramsSetInt(yi, "AA_passes", 1);
	yafaray_paramsSetFloat(yi, "AA_pixelwidth", 1.0);
	yafaray_paramsSetString(yi, "filter_type", "box");
	yafaray_paramsSetInt(yi, "threads", -1);
	yafaray_setupRender(yi);
	yafaray_paramsClearAll(yi);

	yafaray_render(yi, NULL, NULL, YAFARAY_DISPLAY_CONSOLE_NORMAL);
	yafaray_destroyInterface(yi);
	printf("wrote %s\n", out);
	return 0;
}
