"""Model zoo: diffusion-restoration core + restoration nets + task nets.

Mirror of the reference export surface (``model/__init__.py:1-15``)."""
