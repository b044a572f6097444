from pointcontrast_tpu.utils.timer import Timer, AverageMeter
