/* Procedural-texture parity probe: an ortho camera looking straight down
 * at a unit quad whose diffuse color is driven by a procedural texture,
 * lit head-on by a directional light — the image is the texture pattern
 * times a constant, so pattern correlation pins the noise generators
 * against the reference (Blender-compatible newperlin etc.).
 *
 * Usage: proctex_ref <out.hdr> [size] [textype]
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <yafaray_c_api.h>

static yafaray_Interface_t *yi;

int main(int argc, char **argv)
{
	const char *out = argc > 1 ? argv[1] : "proctex_ref.hdr";
	const int size = argc > 2 ? atoi(argv[2]) : 128;
	const char *tex = argc > 3 ? argv[3] : "clouds";

	yi = yafaray_createInterface(YAFARAY_INTERFACE_FOR_RENDERING, NULL, NULL,
								 NULL, YAFARAY_DISPLAY_CONSOLE_NORMAL);
	yafaray_setConsoleVerbosityLevel(yi, YAFARAY_LOG_LEVEL_WARNING);
	yafaray_createScene(yi);
	yafaray_paramsClearAll(yi);

	yafaray_paramsSetString(yi, "type", tex);
	yafaray_paramsSetFloat(yi, "size", 4.0);
	if(strcmp(tex, "clouds") == 0 || strcmp(tex, "marble") == 0)
		yafaray_paramsSetInt(yi, "depth", 2);
	yafaray_createTexture(yi, "T");
	yafaray_paramsClearAll(yi);

	yafaray_paramsSetString(yi, "type", "shinydiffusemat");
	yafaray_paramsSetColor(yi, "color", 1.f, 1.f, 1.f, 1.f);
	yafaray_paramsPushList(yi);
	yafaray_paramsSetString(yi, "element", "shader_node");
	yafaray_paramsSetString(yi, "name", "map0");
	yafaray_paramsSetString(yi, "type", "texture_mapper");
	yafaray_paramsSetString(yi, "texco", "global");
	yafaray_paramsSetString(yi, "texture", "T");
	yafaray_paramsEndList(yi);
	yafaray_paramsSetString(yi, "diffuse_shader", "map0");
	yafaray_createMaterial(yi, "m");
	yafaray_paramsClearAll(yi);

	yafaray_startGeometry(yi);
	yafaray_paramsSetString(yi, "type", "mesh");
	yafaray_createObject(yi, "quad");
	yafaray_paramsClearAll(yi);
	yafaray_setCurrentMaterial(yi, "m");
	yafaray_addVertex(yi, 0, 0, 0);
	yafaray_addVertex(yi, 1, 0, 0);
	yafaray_addVertex(yi, 1, 1, 0);
	yafaray_addVertex(yi, 0, 1, 0);
	yafaray_addTriangle(yi, 0, 1, 2);
	yafaray_addTriangle(yi, 0, 2, 3);
	yafaray_endGeometry(yi);

	yafaray_paramsSetString(yi, "type", "directional");
	yafaray_paramsSetVector(yi, "direction", 0.0, 0.0, 1.0);
	yafaray_paramsSetColor(yi, "color", 1.f, 1.f, 1.f, 1.f);
	yafaray_paramsSetFloat(yi, "power", 1.0);
	yafaray_createLight(yi, "sun");
	yafaray_paramsClearAll(yi);

	yafaray_paramsSetString(yi, "type", "constant");
	yafaray_paramsSetColor(yi, "color", 0.f, 0.f, 0.f, 1.f);
	yafaray_createBackground(yi, "world_background");
	yafaray_paramsClearAll(yi);

	yafaray_paramsSetString(yi, "type", "orthographic");
	yafaray_paramsSetInt(yi, "resx", size);
	yafaray_paramsSetInt(yi, "resy", size);
	yafaray_paramsSetFloat(yi, "scale", 1.0);
	yafaray_paramsSetVector(yi, "from", 0.5, 0.5, 2.0);
	yafaray_paramsSetVector(yi, "to", 0.5, 0.5, 0.0);
	yafaray_paramsSetVector(yi, "up", 0.5, 1.5, 2.0);
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
	yafaray_paramsSetInt(yi, "AA_minsamples", 9);
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
