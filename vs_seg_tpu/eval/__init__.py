from vs_seg_tpu.eval.metrics import dice_score, center_of_mass_slice
