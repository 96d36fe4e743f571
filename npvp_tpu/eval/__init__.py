from npvp_tpu.eval.metrics import mse_score, pred_ave_metrics, psnr, ssim
