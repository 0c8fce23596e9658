import os

from setuptools import find_packages, setup

here = os.path.abspath(os.path.dirname(__file__))

try:
    with open(os.path.join(here, 'README.md'), 'r') as fh:
        long_description = fh.read()
except FileNotFoundError:
    long_description = ''

version = {}
with open(os.path.join(here, 'patchgan_tpu/version.py')) as ver_file:
    exec(ver_file.read(), version)

setup(
    name='patchgan-tpu',
    version=version['__version__'],
    description='TPU-native patchGAN image segmentation framework '
                '(JAX/Flax/Pallas)',
    long_description=long_description,
    long_description_content_type='text/markdown',
    license='GNU General Public License v3',
    packages=find_packages(exclude=['tests']),
    entry_points={
        'console_scripts': [
            'patchgan_train = patchgan_tpu.cli.train:patchgan_train',
            'patchgan_infer = patchgan_tpu.cli.infer:patchgan_infer',
            'patchgan_eval = patchgan_tpu.cli.evaluate:patchgan_eval',
        ]
    },
    python_requires='>=3.10',
    install_requires=[
        'numpy',
        'jax',
        'flax',
        'optax',
        'pyyaml',
        'tqdm',
        'pillow',
    ],
)
