"""Project setup: experiment directories + pretrained SD2.1 weight fetch.

Parity: the reference ``setup.py:1-27`` is not a build script either — it
creates the working directories and downloads ``v2-1_512-ema-pruned.ckpt``.
In zero-egress environments place the checkpoint at ``weights/`` manually;
``edtr_tpu.utils.convert`` converts it losslessly at load time.
"""

import os
import urllib.request

SD21_URL = (
    "https://huggingface.co/stabilityai/stable-diffusion-2-1-base/resolve/"
    "main/v2-1_512-ema-pruned.ckpt"
)


def main() -> None:
    for d in ("datasets/source", "experiments", "weights", "results"):
        os.makedirs(d, exist_ok=True)
    target = "weights/v2-1_512-ema-pruned.ckpt"
    if os.path.exists(target):
        print(f"{target} already present")
        return
    try:
        print(f"downloading SD2.1 base to {target} ...")
        urllib.request.urlretrieve(SD21_URL, target)
        print("done")
    except Exception as e:  # zero-egress boxes land here
        print(
            f"download failed ({e}); place v2-1_512-ema-pruned.ckpt under "
            "weights/ manually."
        )


if __name__ == "__main__":
    main()
