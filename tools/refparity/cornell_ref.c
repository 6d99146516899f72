/* Reference-renderer golden generator for the image-parity test.
 *
 * Builds EXACTLY the scene of tests/scenes.py cornell_builder() through the
 * reference libYafaRay C API (the same entity sequence as the reference's
 * own tests/test00/test00.c:100-288) and renders it with the directlighting
 * integrator (BASELINE.md config 1: "test00-style Cornell box, direct-light
 * integrator, 1 area light, 256x256, 16 spp, CPU reference render as
 * golden"), writing a LINEAR-color-space .hdr (Radiance RGBE) so the
 * comparison is done in radiance units, not 8-bit gamma.
 *
 * Usage: cornell_ref <out.hdr> [size] [spp] [camera]
 *   camera: perspective (default) | orthographic | equirectangular —
 *   the same Cornell box through each projection, pinning the camera
 *   ray-generation conventions against the reference.
 * Build: see tools/refparity/README.md (links against /tmp/refbuild).
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <yafaray_c_api.h>

static yafaray_Interface_t *yi;

static int v(double x, double y, double z) { return yafaray_addVertex(yi, x, y, z); }

static void quad(int a, int b, int c, int d)
{
	/* same diagonal split as SceneBuilder.add_quad: (a,b,c) + (a,c,d) */
	yafaray_addTriangle(yi, a, b, c);
	yafaray_addTriangle(yi, a, c, d);
}

/* tests/scenes.py _box(): axis-aligned box rotated by `rot` radians about
 * the vertical axis through its x/y footprint centre */
static void box(double ox, double oy, double oz, double sx, double sy,
				double sz, double rot)
{
	const double c = cos(rot), s = sin(rot);
	const double cx = ox + sx / 2.0, cy = oy + sy / 2.0;
	int p[8];
	double xs[8] = {ox, ox + sx, ox + sx, ox, ox, ox + sx, ox + sx, ox};
	double ys[8] = {oy, oy, oy + sy, oy + sy, oy, oy, oy + sy, oy + sy};
	double zs[8] = {oz, oz, oz, oz, oz + sz, oz + sz, oz + sz, oz + sz};
	int i;
	for(i = 0; i < 8; ++i)
	{
		const double rx = cx + (xs[i] - cx) * c - (ys[i] - cy) * s;
		const double ry = cy + (xs[i] - cx) * s + (ys[i] - cy) * c;
		p[i] = v(rx, ry, zs[i]);
	}
	quad(p[0], p[1], p[5], p[4]);
	quad(p[1], p[2], p[6], p[5]);
	quad(p[2], p[3], p[7], p[6]);
	quad(p[3], p[0], p[4], p[7]);
	quad(p[4], p[5], p[6], p[7]); /* top */
	quad(p[3], p[2], p[1], p[0]); /* bottom */
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
	const char *out = argc > 1 ? argv[1] : "cornell_ref.hdr";
	const int size = argc > 2 ? atoi(argv[2]) : 256;
	const int spp = argc > 3 ? atoi(argv[3]) : 256;

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
	/* box [0,1]^3, camera looks +y, z up (tests/scenes.py quads) */
	yafaray_setCurrentMaterial(yi, "white"); /* floor */
	quad(v(0, 0, 0), v(1, 0, 0), v(1, 1, 0), v(0, 1, 0));
	quad(v(0, 0, 1), v(0, 1, 1), v(1, 1, 1), v(1, 0, 1)); /* ceiling */
	quad(v(0, 1, 0), v(1, 1, 0), v(1, 1, 1), v(0, 1, 1)); /* back */
	yafaray_setCurrentMaterial(yi, "red"); /* left */
	quad(v(0, 0, 0), v(0, 1, 0), v(0, 1, 1), v(0, 0, 1));
	yafaray_setCurrentMaterial(yi, "green"); /* right */
	quad(v(1, 0, 0), v(1, 0, 1), v(1, 1, 1), v(1, 1, 0));

	yafaray_paramsSetString(yi, "type", "mesh");
	yafaray_createObject(yi, "box1");
	yafaray_paramsClearAll(yi);
	yafaray_setCurrentMaterial(yi, "white");
	box(0.55, 0.45, 0.0, 0.30, 0.30, 0.30, -0.30); /* short box */

	yafaray_paramsSetString(yi, "type", "mesh");
	yafaray_createObject(yi, "box2");
	yafaray_paramsClearAll(yi);
	yafaray_setCurrentMaterial(yi, "white");
	box(0.15, 0.6, 0.0, 0.30, 0.30, 0.60, 0.35); /* tall box */

	yafaray_endGeometry(yi);

	/* area light (invisible to camera rays in the reference — our scene
	 * sets visibility='invisible' to match) */
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

	/* camera: perspective focal = 0.5/tan(fov/2), fov 39 deg horizontal
	 * (image plane width 1 at distance focal — camera_perspective.cc:66);
	 * orthographic from the same pose (scale = view width in world units);
	 * equirectangular panorama from the box centre */
	{
		const char *camt = argc > 4 ? argv[4] : "perspective";
		const int is_persp = camt[0] == 'p';
		const int is_archi = strcmp(camt, "architect") == 0;
		const int is_ortho = camt[0] == 'o';
		const int is_angul = strcmp(camt, "angular") == 0;
		const int is_equi = camt[0] == 'e';
		yafaray_paramsSetString(yi, "type", camt);
		yafaray_paramsSetInt(yi, "resx", size);
		yafaray_paramsSetInt(yi, "resy", size);
		if(is_persp || is_archi)
			yafaray_paramsSetFloat(yi, "focal",
								   0.5 / tan(0.5 * 39.0 * M_PI / 180.0));
		if(is_ortho)
			yafaray_paramsSetFloat(yi, "scale", 1.4);
		if(is_angul)
		{
			yafaray_paramsSetFloat(yi, "angle", 90.0);
			yafaray_paramsSetFloat(yi, "max_angle", 90.0);
		}
		if(is_equi)
		{
			yafaray_paramsSetVector(yi, "from", 0.5, 0.5, 0.5);
			yafaray_paramsSetVector(yi, "to", 0.5, 1.5, 0.5);
			yafaray_paramsSetVector(yi, "up", 0.5, 0.5, 1.5);
		}
		else if(is_archi)
		{
			/* tilted UP so the vertical-line-preserving projection is
			 * actually distinct from perspective */
			yafaray_paramsSetVector(yi, "from", 0.5, -1.35, 0.2);
			yafaray_paramsSetVector(yi, "to", 0.5, 0.5, 0.8);
			yafaray_paramsSetVector(yi, "up", 0.5, -1.6, 1.1);
		}
		else
		{
			yafaray_paramsSetVector(yi, "from", 0.5, -1.35, 0.5);
			yafaray_paramsSetVector(yi, "to", 0.5, 0.5, 0.5);
			yafaray_paramsSetVector(yi, "up", 0.5, -1.35, 1.5);
		}
		yafaray_createCamera(yi, "cam");
		yafaray_paramsClearAll(yi);
	}

	yafaray_paramsSetString(yi, "camera_name", "cam");
	yafaray_createRenderView(yi, "view");
	yafaray_paramsClearAll(yi);

	/* linear HDR output: radiance-space comparison, no gamma/8-bit quant */
	yafaray_paramsSetString(yi, "image_path", out);
	yafaray_paramsSetString(yi, "color_space", "LinearRGB");
	yafaray_paramsSetFloat(yi, "gamma", 1.0);
	yafaray_createOutput(yi, "out_hdr");
	yafaray_paramsClearAll(yi);

	yafaray_paramsSetString(yi, "type", "directlighting");
	yafaray_paramsSetInt(yi, "raydepth", 2);
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
