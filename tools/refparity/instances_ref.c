/* Fourth reference-parity golden: TRUE INSTANCING (the reference's
 * tests/test02 flow) — one base cube marked is_base_object, five
 * instances with distinct translation/scale/rotation matrices over a
 * floor, direct lighting. Pins the instance transform conventions
 * (row-major 4x4, translation in column 3), the instanced intersection
 * and the instanced shading frame against the reference.
 *
 * Usage: instances_ref <out.hdr> [size] [spp]
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

int main(int argc, char **argv)
{
	const char *out = argc > 1 ? argv[1] : "instances_ref.hdr";
	const int size = argc > 2 ? atoi(argv[2]) : 160;
	const int spp = argc > 3 ? atoi(argv[3]) : 256;
	int p[8];
	int i;

	yi = yafaray_createInterface(YAFARAY_INTERFACE_FOR_RENDERING, NULL, NULL,
								 NULL, YAFARAY_DISPLAY_CONSOLE_NORMAL);
	yafaray_setConsoleVerbosityLevel(yi, YAFARAY_LOG_LEVEL_WARNING);
	yafaray_createScene(yi);
	yafaray_paramsClearAll(yi);

	yafaray_paramsSetString(yi, "type", "shinydiffusemat");
	yafaray_paramsSetColor(yi, "color", 0.7f, 0.7f, 0.7f, 1.f);
	yafaray_createMaterial(yi, "white");
	yafaray_paramsClearAll(yi);
	yafaray_paramsSetString(yi, "type", "shinydiffusemat");
	yafaray_paramsSetColor(yi, "color", 0.3f, 0.4f, 0.7f, 1.f);
	yafaray_createMaterial(yi, "blue");
	yafaray_paramsClearAll(yi);

	yafaray_startGeometry(yi);

	yafaray_paramsSetString(yi, "type", "mesh");
	yafaray_createObject(yi, "floor");
	yafaray_paramsClearAll(yi);
	yafaray_setCurrentMaterial(yi, "white");
	quad(v(-4, -4, 0), v(4, -4, 0), v(4, 4, 0), v(-4, 4, 0));

	/* base cube [-0.5,0.5]^3, NOT rendered directly (is_base_object) */
	yafaray_paramsSetString(yi, "type", "mesh");
	yafaray_paramsSetBool(yi, "is_base_object", YAFARAY_BOOL_TRUE);
	yafaray_createObject(yi, "cube");
	yafaray_paramsClearAll(yi);
	yafaray_setCurrentMaterial(yi, "blue");
	for(i = 0; i < 8; ++i)
		p[i] = v((i & 1) ? 0.5 : -0.5, (i & 2) ? 0.5 : -0.5,
				 (i & 4) ? 0.5 : -0.5);
	quad(p[0], p[2], p[3], p[1]); /* bottom (z=-0.5), outward -z */
	quad(p[4], p[5], p[7], p[6]); /* top */
	quad(p[0], p[1], p[5], p[4]); /* -y */
	quad(p[2], p[6], p[7], p[3]); /* +y */
	quad(p[0], p[4], p[6], p[2]); /* -x */
	quad(p[1], p[3], p[7], p[5]); /* +x */

	yafaray_endGeometry(yi);

	/* five instances: translation + per-instance scale + one rotated */
	{
		const double xs[5] = {-2.0, -0.9, 0.3, 1.6, 0.1};
		const double ys[5] = {-0.6, 0.9, -0.2, 0.6, 2.0};
		const double ss[5] = {0.8, 1.2, 0.6, 1.0, 0.9};
		int k;
		for(k = 0; k < 5; ++k)
		{
			const double s = ss[k];
			const double a = 0.5 * k; /* z-rotation angle */
			const double c = cos(a) * s, sn = sin(a) * s;
			yafaray_addInstance(yi, "cube",
								(float)c, (float)-sn, 0.f, (float)xs[k],
								(float)sn, (float)c, 0.f, (float)ys[k],
								0.f, 0.f, (float)s, (float)(0.5 * s),
								0.f, 0.f, 0.f, 1.f);
		}
	}

	yafaray_paramsSetString(yi, "type", "pointlight");
	yafaray_paramsSetColor(yi, "color", 1.f, 1.f, 1.f, 1.f);
	yafaray_paramsSetVector(yi, "from", 1.0, -1.5, 4.0);
	yafaray_paramsSetFloat(yi, "power", 20.0);
	yafaray_createLight(yi, "lamp");
	yafaray_paramsClearAll(yi);

	yafaray_paramsSetString(yi, "type", "constant");
	yafaray_paramsSetColor(yi, "color", 0.f, 0.f, 0.f, 1.f);
	yafaray_createBackground(yi, "world_background");
	yafaray_paramsClearAll(yi);

	yafaray_paramsSetString(yi, "type", "perspective");
	yafaray_paramsSetInt(yi, "resx", size);
	yafaray_paramsSetInt(yi, "resy", size);
	yafaray_paramsSetFloat(yi, "focal", 0.5 / tan(0.5 * 50.0 * M_PI / 180.0));
	yafaray_paramsSetVector(yi, "from", 0.0, -5.5, 3.5);
	yafaray_paramsSetVector(yi, "to", 0.0, 0.0, 0.4);
	yafaray_paramsSetVector(yi, "up", 0.0, -5.5, 4.5);
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
