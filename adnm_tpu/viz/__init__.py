from adnm_tpu.viz.colormap import COLOR_MAP, BOUNDS, THRESHOLDS, gray2color
from adnm_tpu.viz.render import vis_res, vis_res_1b1
