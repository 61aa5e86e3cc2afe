from . import combine, idn_losses, lpips
from .flow import flow_evaluate, flow_sequence_loss, validity_mask
from .fwl import fwl_metric, voxel_warping_flow_loss
from .recon import flow_recon_loss, psnr, recon_evaluate, recon_loss
from .ssim import ssim
