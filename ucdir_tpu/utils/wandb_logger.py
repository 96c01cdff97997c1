"""W&B logger — parity with /root/reference/core/wandb_logger.py:3-117.

Gated on the wandb package (absent in this image); construction raises
ImportError, which sr.py catches and logs.
"""
from __future__ import annotations


class WandbLogger:
    """Log metrics, images, eval tables and checkpoint artifacts to W&B."""

    def __init__(self, opt):
        import wandb  # raises if unavailable
        self._wandb = wandb
        if self._wandb.run is None:
            self._wandb.init(
                project=(opt.get('wandb') or {}).get('project', 'ucdir_tpu'),
                config=dict(opt), dir='./experiments')
        self.config = self._wandb.config
        self._ckpt_dir = (opt.get('path') or {}).get('checkpoint', '')
        self.eval_table = None
        self.infer_table = None
        if self.config.get('log_eval', None):
            self.eval_table = self._wandb.Table(
                columns=['fake_image', 'sr_image', 'hr_image', 'psnr', 'ssim'])
        elif self.config.get('log_infer', None):
            self.infer_table = self._wandb.Table(
                columns=['fake_image', 'sr_image', 'hr_image'])

    def log_metrics(self, metrics, commit=True):
        self._wandb.log(metrics, commit=commit)

    def log_image(self, key_name, image_array):
        self._wandb.log({key_name: self._wandb.Image(image_array)})

    def log_images(self, key_name, list_images):
        self._wandb.log({key_name: [self._wandb.Image(im)
                                    for im in list_images]})

    def log_checkpoint(self, current_epoch, current_step):
        """Upload the orbax checkpoint dir as a W&B artifact (reference
        core/wandb_logger.py:56-70 uploads the torch .pth triple)."""
        import os
        model_artifact = self._wandb.Artifact(
            self._wandb.run.id + '_model', type='model')
        tag = 'I{}_E{}'.format(current_step, current_epoch)
        gen_path = os.path.join(self._ckpt_dir, tag)
        if not os.path.isdir(gen_path):  # periodic 'latest' overwrite tag
            gen_path = os.path.join(self._ckpt_dir, 'I_Elatest')
        model_artifact.add_dir(gen_path)
        self._wandb.log_artifact(model_artifact,
                                 aliases=['latest', tag])

    def log_eval_data(self, fake_img, sr_img, hr_img, psnr=None, ssim=None):
        if self.eval_table is not None:
            self.eval_table.add_data(
                self._wandb.Image(fake_img), self._wandb.Image(sr_img),
                self._wandb.Image(hr_img), psnr, ssim)
        elif self.infer_table is not None:
            self.infer_table.add_data(
                self._wandb.Image(fake_img), self._wandb.Image(sr_img),
                self._wandb.Image(hr_img))

    def log_eval_table(self, commit=False):
        if self.eval_table is not None:
            self._wandb.log({'eval_data': self.eval_table}, commit=commit)
        elif self.infer_table is not None:
            self._wandb.log({'infer_data': self.infer_table}, commit=commit)
