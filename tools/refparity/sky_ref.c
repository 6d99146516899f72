/* Sky-background parity golden: an equirectangular panorama of the
 * analytic sky with NO geometry — camera rays all escape, so the image
 * IS the background function. Pins the Preetham sunsky (and darksky)
 * implementation point-for-point over the whole sky dome.
 *
 * Usage: sky_ref <out.hdr> [size] [bg: sunsky|darksky]
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <yafaray_c_api.h>

static yafaray_Interface_t *yi;

int main(int argc, char **argv)
{
	const char *out = argc > 1 ? argv[1] : "sky_ref.hdr";
	const int size = argc > 2 ? atoi(argv[2]) : 128;
	const char *bg = argc > 3 ? argv[3] : "sunsky";

	yi = yafaray_createInterface(YAFARAY_INTERFACE_FOR_RENDERING, NULL, NULL,
								 NULL, YAFARAY_DISPLAY_CONSOLE_NORMAL);
	yafaray_setConsoleVerbosityLevel(yi, YAFARAY_LOG_LEVEL_WARNING);
	yafaray_createScene(yi);
	yafaray_paramsClearAll(yi);

	/* a dummy far-away triangle: the scene must have SOME geometry for
	 * the accelerator build */
	yafaray_paramsSetString(yi, "type", "shinydiffusemat");
	yafaray_paramsSetColor(yi, "color", 0.5f, 0.5f, 0.5f, 1.f);
	yafaray_createMaterial(yi, "m");
	yafaray_paramsClearAll(yi);
	yafaray_startGeometry(yi);
	yafaray_paramsSetString(yi, "type", "mesh");
	yafaray_createObject(yi, "dummy");
	yafaray_paramsClearAll(yi);
	yafaray_setCurrentMaterial(yi, "m");
	yafaray_addVertex(yi, 500.0, 500.0, -500.0);
	yafaray_addVertex(yi, 501.0, 500.0, -500.0);
	yafaray_addVertex(yi, 500.0, 501.0, -500.0);
	yafaray_addTriangle(yi, 0, 1, 2);
	yafaray_endGeometry(yi);

	yafaray_paramsSetString(yi, "type", bg);
	yafaray_paramsSetVector(yi, "from", 0.4, 0.3, 0.6); /* sun direction */
	yafaray_paramsSetFloat(yi, "turbidity", 3.0);
	yafaray_paramsSetFloat(yi, "power", 1.0);
	yafaray_paramsSetBool(yi, "add_sun", 0);
	yafaray_paramsSetBool(yi, "background_light", 0);
	if(strcmp(bg, "darksky") == 0)
	{
		yafaray_paramsSetFloat(yi, "altitude", 0.0);
		yafaray_paramsSetBool(yi, "night", 0);
		yafaray_paramsSetFloat(yi, "exposure", 1.0);
		yafaray_paramsSetBool(yi, "clamp_rgb", 0);
		yafaray_paramsSetBool(yi, "gamma_enc", 0);
	}
	yafaray_createBackground(yi, "world_background");
	yafaray_paramsClearAll(yi);

	yafaray_paramsSetString(yi, "type", "equirectangular");
	yafaray_paramsSetInt(yi, "resx", size);
	yafaray_paramsSetInt(yi, "resy", size);
	yafaray_paramsSetVector(yi, "from", 0.0, 0.0, 0.0);
	yafaray_paramsSetVector(yi, "to", 0.0, 1.0, 0.0);
	yafaray_paramsSetVector(yi, "up", 0.0, 0.0, 1.0);
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
	yafaray_paramsSetString(yi, "background_name", "world_background");
	yafaray_paramsSetString(yi, "scene_accelerator", "yafaray-kdtree-original");
	yafaray_paramsSetInt(yi, "width", size);
	yafaray_paramsSetInt(yi, "height", size);
	yafaray_paramsSetInt(yi, "AA_minsamples", 4);
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
