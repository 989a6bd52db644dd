from vs_seg_tpu.compat.torch_import import import_unet2d5_spvpa, load_pth
