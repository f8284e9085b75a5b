from adnm_tpu.data.shanghai import ShanghaiDataset, make_datasets, PIXEL_SCALE
from adnm_tpu.data.loader import BatchLoader
