/* Third reference-parity golden: the Cornell box with an analytic GLASS
 * sphere — pins the specular transport conventions (refraction
 * direction, Fresnel split, TIR, filter color) against the reference.
 * Any IOR or refraction-direction mismatch displaces the through-sphere
 * image strongly, so region means are a sharp test.
 *
 * Usage: glass_ref <out.hdr> [size] [spp]
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
	const char *out = argc > 1 ? argv[1] : "glass_ref.hdr";
	const int size = argc > 2 ? atoi(argv[2]) : 160;
	const int spp = argc > 3 ? atoi(argv[3]) : 768;

	yi = yafaray_createInterface(YAFARAY_INTERFACE_FOR_RENDERING, NULL, NULL,
								 NULL, YAFARAY_DISPLAY_CONSOLE_NORMAL);
	yafaray_setConsoleVerbosityLevel(yi, YAFARAY_LOG_LEVEL_WARNING);
	yafaray_createScene(yi);
	yafaray_paramsClearAll(yi);

	material("white", 0.73f, 0.73f, 0.73f);
	material("red", 0.65f, 0.05f, 0.05f);
	material("green", 0.12f, 0.45f, 0.15f);

	yafaray_paramsSetString(yi, "type", "glass");
	yafaray_paramsSetFloat(yi, "IOR", 1.5);
	yafaray_paramsSetColor(yi, "filter_color", 0.98f, 0.98f, 0.98f, 1.f);
	yafaray_paramsSetColor(yi, "mirror_color", 1.f, 1.f, 1.f, 1.f);
	yafaray_createMaterial(yi, "glass");
	yafaray_paramsClearAll(yi);

	yafaray_startGeometry(yi);
	yafaray_paramsSetString(yi, "type", "mesh");
	yafaray_createObject(yi, "walls");
	yafaray_paramsClearAll(yi);
	yafaray_setCurrentMaterial(yi, "white");
	quad(v(0, 0, 0), v(1, 0, 0), v(1, 1, 0), v(0, 1, 0));          /* floor */
	quad(v(0, 0, 1), v(0, 1, 1), v(1, 1, 1), v(1, 0, 1));          /* ceiling */
	quad(v(0, 1, 0), v(1, 1, 0), v(1, 1, 1), v(0, 1, 1));          /* back */
	yafaray_setCurrentMaterial(yi, "red");
	quad(v(0, 0, 0), v(0, 1, 0), v(0, 1, 1), v(0, 0, 1));          /* left */
	yafaray_setCurrentMaterial(yi, "green");
	quad(v(1, 0, 0), v(1, 0, 1), v(1, 1, 1), v(1, 1, 0));          /* right */

	yafaray_paramsSetString(yi, "type", "sphere");
	yafaray_paramsSetVector(yi, "center", 0.5, 0.5, 0.35);
	yafaray_paramsSetFloat(yi, "radius", 0.22);
	yafaray_paramsSetString(yi, "material", "glass");
	yafaray_createObject(yi, "ball");
	yafaray_paramsClearAll(yi);
	yafaray_endGeometry(yi);

	yafaray_paramsSetString(yi, "type", "arealight");
	yafaray_paramsSetVector(yi, "corner", 0.35, 0.35, 0.999);
	yafaray_paramsSetVector(yi, "point1", 0.35, 0.65, 0.999);
	yafaray_paramsSetVector(yi, "point2", 0.65, 0.35, 0.999);
	yafaray_paramsSetColor(yi, "color", 1.0f, 0.9f, 0.8f, 1.f);
	yafaray_paramsSetFloat(yi, "power", 12.0);
	yafaray_paramsSetInt(yi, "samples", 4);
	yafaray_createLight(yi, "lamp");
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

	yafaray_paramsSetString(yi, "type", "pathtracing");
	yafaray_paramsSetInt(yi, "path_samples", 1);
	yafaray_paramsSetInt(yi, "bounces", 6);
	yafaray_paramsSetInt(yi, "russian_roulette_min_bounces", 20);
	yafaray_paramsSetString(yi, "caustic_type", "path");
	yafaray_createIntegrator(yi, "surfintegr");
	yafaray_paramsClearAll(yi);

	yafaray_paramsSetString(yi, "integrator_name", "surfintegr");
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
