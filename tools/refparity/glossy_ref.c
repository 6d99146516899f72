/* Second reference-parity golden: uv-textured floor + analytic glossy
 * sphere + white back wall, path tracing with GI — covers the image
 * texture pipeline (RAM image -> texture_mapper shader node, the
 * test00.c:110-157 path), the glossy BSDF, the sphere primitive and the
 * multi-bounce estimator in one scene.
 *
 * Usage: glossy_ref <out.hdr> [size] [spp]
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <yafaray_c_api.h>

static yafaray_Interface_t *yi;

static int v(double x, double y, double z) { return yafaray_addVertex(yi, x, y, z); }

int main(int argc, char **argv)
{
	const char *out = argc > 1 ? argv[1] : "glossy_ref.hdr";
	const int size = argc > 2 ? atoi(argv[2]) : 256;
	const int spp = argc > 3 ? atoi(argv[3]) : 512;
	const int tex_n = 64;
	int i, j;

	yi = yafaray_createInterface(YAFARAY_INTERFACE_FOR_RENDERING, NULL, NULL,
								 NULL, YAFARAY_DISPLAY_CONSOLE_NORMAL);
	yafaray_setConsoleVerbosityLevel(yi, YAFARAY_LOG_LEVEL_INFO);
	yafaray_createScene(yi);
	yafaray_paramsClearAll(yi);

	{
		/* deterministic SMOOTH pattern (same formula as the python side;
		 * smooth -> insensitive to bilinear-vs-nearest boundary handling) */
		yafaray_Image_t *image = NULL;
		yafaray_paramsSetString(yi, "type", "ColorAlpha");
		yafaray_paramsSetString(yi, "image_optimization", "none");
		/* NOTE: Image::factory reads "width"/"height" (image.cc:51-52).
		 * The reference's own tests/test00/test00.c passes "tex_width"/
		 * "tex_height", which the factory silently ignores — test00's RAM
		 * texture is actually an empty 100x100 black image (invisible to
		 * its assertion-free test suite). */
		yafaray_paramsSetInt(yi, "width", tex_n);
		yafaray_paramsSetInt(yi, "height", tex_n);
		image = yafaray_createImage(yi, "FloorImg");
		yafaray_paramsClearAll(yi);
		for(i = 0; i < tex_n; ++i)
			for(j = 0; j < tex_n; ++j)
			{
				const float r = 0.25f + 0.25f * (1.f + sinf(0.35f * i));
				const float g = 0.25f + 0.25f * (1.f + sinf(0.35f * j));
				const float b = 0.5f;
				yafaray_setImageColor(image, i, j, r, g, b, 1.f);
			}
	}

	yafaray_paramsSetString(yi, "type", "image");
	yafaray_paramsSetString(yi, "image_name", "FloorImg");
	yafaray_createTexture(yi, "TexFloor");
	yafaray_paramsClearAll(yi);

	/* textured diffuse floor: diffuse_shader <- uv texture_mapper */
	yafaray_paramsSetString(yi, "type", "shinydiffusemat");
	yafaray_paramsSetColor(yi, "color", 1.f, 1.f, 1.f, 1.f);
	yafaray_paramsPushList(yi);
	yafaray_paramsSetString(yi, "element", "shader_node");
	yafaray_paramsSetString(yi, "name", "map0");
	yafaray_paramsSetString(yi, "type", "texture_mapper");
	yafaray_paramsSetString(yi, "texco", "uv");
	yafaray_paramsSetString(yi, "texture", "TexFloor");
	yafaray_paramsEndList(yi);
	yafaray_paramsSetString(yi, "diffuse_shader", "map0");
	yafaray_createMaterial(yi, "floor");
	yafaray_paramsClearAll(yi);

	yafaray_paramsSetString(yi, "type", "shinydiffusemat");
	yafaray_paramsSetColor(yi, "color", 0.73f, 0.73f, 0.73f, 1.f);
	yafaray_createMaterial(yi, "white");
	yafaray_paramsClearAll(yi);

	/* glossy sphere material (material_glossy.cc factory params) */
	yafaray_paramsSetString(yi, "type", "glossy");
	yafaray_paramsSetColor(yi, "color", 0.8f, 0.8f, 0.8f, 1.f);
	yafaray_paramsSetColor(yi, "diffuse_color", 0.3f, 0.25f, 0.2f, 1.f);
	yafaray_paramsSetFloat(yi, "glossy_reflect", 0.7);
	yafaray_paramsSetFloat(yi, "diffuse_reflect", 1.0);
	yafaray_paramsSetFloat(yi, "exponent", 25.0);
	yafaray_paramsSetBool(yi, "as_diffuse", 0);
	yafaray_createMaterial(yi, "gloss");
	yafaray_paramsClearAll(yi);

	yafaray_startGeometry(yi);

	yafaray_paramsSetString(yi, "type", "mesh");
	yafaray_paramsSetBool(yi, "has_uv", 1);
	yafaray_createObject(yi, "floorobj");
	yafaray_paramsClearAll(yi);
	yafaray_setCurrentMaterial(yi, "floor");
	{
		int a = v(0, 0, 0), b = v(1, 0, 0), c = v(1, 1, 0), d = v(0, 1, 0);
		int ua = yafaray_addUv(yi, 0.f, 0.f), ub = yafaray_addUv(yi, 1.f, 0.f);
		int uc = yafaray_addUv(yi, 1.f, 1.f), ud = yafaray_addUv(yi, 0.f, 1.f);
		yafaray_addTriangleWithUv(yi, a, b, c, ua, ub, uc);
		yafaray_addTriangleWithUv(yi, a, c, d, ua, uc, ud);
	}

	yafaray_paramsSetString(yi, "type", "mesh");
	yafaray_createObject(yi, "back");
	yafaray_paramsClearAll(yi);
	yafaray_setCurrentMaterial(yi, "white");
	{
		int a = v(0, 1, 0), b = v(1, 1, 0), c = v(1, 1, 1), d = v(0, 1, 1);
		yafaray_addTriangle(yi, a, b, c);
		yafaray_addTriangle(yi, a, c, d);
	}

	/* analytic sphere primitive (object type "sphere"); its material comes
	 * from the "material" param (SpherePrimitive::factory,
	 * primitive_sphere.cc:46-49), not setCurrentMaterial */
	yafaray_paramsSetString(yi, "type", "sphere");
	yafaray_paramsSetVector(yi, "center", 0.5, 0.5, 0.3);
	yafaray_paramsSetFloat(yi, "radius", 0.25);
	yafaray_paramsSetString(yi, "material", "gloss");
	yafaray_createObject(yi, "ball");
	yafaray_paramsClearAll(yi);

	yafaray_endGeometry(yi);

	yafaray_paramsSetString(yi, "type", "arealight");
	yafaray_paramsSetVector(yi, "corner", 0.3, 0.3, 1.2);
	yafaray_paramsSetVector(yi, "point1", 0.3, 0.7, 1.2);
	yafaray_paramsSetVector(yi, "point2", 0.7, 0.3, 1.2);
	yafaray_paramsSetColor(yi, "color", 1.0f, 0.95f, 0.9f, 1.f);
	yafaray_paramsSetFloat(yi, "power", 6.0);
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
	yafaray_paramsSetFloat(yi, "focal", 0.5 / tan(0.5 * 50.0 * M_PI / 180.0));
	yafaray_paramsSetVector(yi, "from", 0.5, -0.9, 0.55);
	yafaray_paramsSetVector(yi, "to", 0.5, 0.5, 0.3);
	yafaray_paramsSetVector(yi, "up", 0.5, -0.9, 1.55);
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

	/* path tracing with GI; one path per AA sample, RR effectively off so
	 * both estimators are plain fixed-depth path tracers */
	yafaray_paramsSetString(yi, "type", "pathtracing");
	yafaray_paramsSetInt(yi, "path_samples", 1);
	yafaray_paramsSetInt(yi, "bounces", 3);
	yafaray_paramsSetInt(yi, "russian_roulette_min_bounces", 10);
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
