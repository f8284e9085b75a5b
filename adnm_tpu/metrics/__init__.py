from adnm_tpu.metrics.evaluator import SimplifiedEvaluator
from adnm_tpu.metrics.ssim import cv2_parity_ssim
