"""Pinned lossy-WebP (VP8 key-frame / VP8X+ALPH) fixture blobs.

Every blob here is REAL libwebp encoder output (WebPEncodeRGB(A) over
deterministic synthetic images), captured once and embedded so the query
path needs no encoder at runtime. The from-scratch decoders in
functions/vp8.py and functions/webp.py decode each one bit-exactly against
libwebp (YUV planes vs WebPDecodeYUV; the ALPH alpha plane vs
WebPDecodeRGBA's A channel — asserted at capture time and re-asserted by the
interop tests when libwebp is present). PINNED_STATS holds the decoded-plane
ground truth used by the multimodal_decode_vp8 oracle: any decoder drift
flips a hash.
"""

from __future__ import annotations

import base64

# (width, height) -> tiny real lossy WebP for the yield scorecard
_YIELD_B64 = {
    (2, 1): (
        "UklGRiYAAABXRUJQVlA4IBoAAAAwAQCdASoCAAEAAgA0JaQAA3AA/vpoj54QAA=="
    ),
    (2, 2): (
        "UklGRi4AAABXRUJQVlA4ICIAAAAwAQCdASoCAAIAAgA0JaQAA3AA/vmW3aloy9M7"
        "7evPCAAA"
    ),
    (2, 3): (
        "UklGRiwAAABXRUJQVlA4ICAAAACQAQCdASoCAAMAAgA0JaQAAudPjMAA/vy3/yfJ"
        "XgQAAA=="
    ),
    (2, 4): (
        "UklGRiwAAABXRUJQVlA4ICAAAACQAQCdASoCAAQAAgA0JaQAAudFrAAA/vxYfVPD"
        "XgQAAA=="
    ),
    (3, 1): (
        "UklGRioAAABXRUJQVlA4IB4AAAAwAQCdASoDAAEAAgA0JaQAA3AA/voUHnHBIQev"
        "AgA="
    ),
    (3, 2): (
        "UklGRiwAAABXRUJQVlA4ICAAAACQAQCdASoDAAIAAgA0JaQAAudZtgAA/v0f5N8r"
        "wIAAAA=="
    ),
    (3, 3): (
        "UklGRiwAAABXRUJQVlA4ICAAAACQAQCdASoDAAMAAgA0JaQAAudZtgAA/vxrgN1+"
        "vAgAAA=="
    ),
    (3, 4): (
        "UklGRiwAAABXRUJQVlA4ICAAAACQAQCdASoDAAQAAgA0JaQAAudFrAAA/vwDy1BY"
        "rnhAAA=="
    ),
    (4, 1): (
        "UklGRiwAAABXRUJQVlA4ICAAAAAwAQCdASoEAAEAAgA0JaQAA3AA/vnFNqHjoICp"
        "54QAAA=="
    ),
    (4, 2): (
        "UklGRiwAAABXRUJQVlA4ICAAAACQAQCdASoEAAIAAgA0JaQAAudZtgAA/vzI8yA5"
        "4QAAAA=="
    ),
    (4, 3): (
        "UklGRiwAAABXRUJQVlA4ICAAAACQAQCdASoEAAMAAgA0JaQAAudPjMAA/vxrfII+"
        "LwIAAA=="
    ),
    (4, 4): (
        "UklGRiwAAABXRUJQVlA4ICAAAACQAQCdASoEAAQAAgA0JaQAAudZtgAA/vwDyUdK"
        "8CAAAA=="
    ),
    (5, 1): (
        "UklGRiwAAABXRUJQVlA4ICAAAACQAQCdASoFAAEAAgA0JaQAAudZtgAA/v2wJglu"
        "eEAAAA=="
    ),
    (5, 2): (
        "UklGRiwAAABXRUJQVlA4ICAAAACQAQCdASoFAAIAAgA0JaQAAudGFIAA/vzI+jqU"
        "V4EAAA=="
    ),
    (5, 3): (
        "UklGRiwAAABXRUJQVlA4ICAAAACQAQCdASoFAAMAAgA0JaQAAudZtgAA/vxrgfgV"
        "68CAAA=="
    ),
    (5, 4): (
        "UklGRiwAAABXRUJQVlA4ICAAAACQAQCdASoFAAQAAgA0JaQAAudIE3AA/vwDy6gI"
        "TnhAAA=="
    ),
    (6, 1): (
        "UklGRiwAAABXRUJQVlA4ICAAAACQAQCdASoGAAEAAgA0JaQAAudZtgAA/v2wYION"
        "eBAAAA=="
    ),
    (6, 2): (
        "UklGRi4AAABXRUJQVlA4ICIAAACQAQCdASoGAAIAAgA0JaQAAudP3WAA/vzI/frQ"
        "MFeBAAAA"
    ),
    (6, 3): (
        "UklGRi4AAABXRUJQVlA4ICIAAACQAQCdASoGAAMAAgA0JaQAAudVB9AA/vxrgoJN"
        "tteBAAAA"
    ),
    (6, 4): (
        "UklGRi4AAABXRUJQVlA4ICIAAACwAQCdASoGAAQAAgA0JaQAAudg5XAAAP78A8vc"
        "gy14EAAA"
    ),
    (7, 1): (
        "UklGRiwAAABXRUJQVlA4ICAAAACQAQCdASoHAAEAAgA0JaQAAp1HI1AA/v2whxJ7"
        "UPPCAA=="
    ),
    (7, 2): (
        "UklGRiwAAABXRUJQVlA4ICAAAACQAQCdASoHAAIAAgA0JaQAAudZtgAA/vzI/vio"
        "TnhAAA=="
    ),
    (7, 3): (
        "UklGRiwAAABXRUJQVlA4ICAAAACQAQCdASoHAAMAAgA0JaQAAudQDBAA/vxrgpGw"
        "Y68CAA=="
    ),
    (7, 4): (
        "UklGRiwAAABXRUJQVlA4ICAAAACQAQCdASoHAAQAAgA0JaQAAudZtgAA/vwDy+JR"
        "2rwIAA=="
    ),
}

# (width, height) -> VP8X + compressed-ALPH + VP8 (gradient alpha)
_YIELD_ALPHA_B64 = {
    (2, 1): (
        "UklGRkgAAABXRUJQVlA4WAoAAAAQAAAAAQAAAAAAQUxQSAMAAAAAIiUAVlA4IB4A"
        "AABwAQCdASoCAAEAAgA0JZwCdAFAAAD++eV6elgAAAA="
    ),
    (2, 2): (
        "UklGRkgAAABXRUJQVlA4WAoAAAAQAAAAAQAAAQAAQUxQSAUAAAAAIiUpLABWUDgg"
        "HAAAAHABAJ0BKgIAAgACADQlnAJ0AUAAAP75TVIJ8AA="
    ),
    (2, 3): (
        "UklGRlAAAABXRUJQVlA4WAoAAAAQAAAAAQAAAgAAQUxQSAcAAAAAIiUpLDAzAFZQ"
        "OCAiAAAAcAEAnQEqAgADAAIANCWcAnQBQAAA/vidxx3mCFEVE1QAAA=="
    ),
    (2, 4): (
        "UklGRlAAAABXRUJQVlA4WAoAAAAQAAAAAQAAAwAAQUxQSAkAAAAAIiUpLDAzNzoA"
        "VlA4ICAAAACwAQCdASoCAAQAAgA0JZwCdAEO/gLsAP78V84RHTvgAA=="
    ),
    (3, 1): (
        "UklGRkwAAABXRUJQVlA4WAoAAAAQAAAAAgAAAAAAQUxQSAQAAAAAIiUoVlA4ICIA"
        "AADQAQCdASoDAAEAAgA0JZwCdAEPDemoAAD+/VRsgPEwAAAA"
    ),
    (3, 2): (
        "UklGRkwAAABXRUJQVlA4WAoAAAAQAAAAAgAAAQAAQUxQSAcAAAAAIiUoKSwvAFZQ"
        "OCAeAAAAcAEAnQEqAwACAAIANCWcAnQBQAAA/vjxsKDro8AA"
    ),
    (3, 3): (
        "UklGRlIAAABXRUJQVlA4WAoAAAAQAAAAAgAAAgAAQUxQSAoAAAAAIiUoKSwvMDM2"
        "VlA4ICIAAABwAQCdASoDAAMAAgA0JZwCdAFAAAD++Czzn18YIURUTVAA"
    ),
    (3, 4): (
        "UklGRlYAAABXRUJQVlA4WAoAAAAQAAAAAgAAAwAAQUxQSA0AAAAAIiUoKSwvMDM2"
        "Nzo9AFZQOCAiAAAAsAEAnQEqAwAEAAIANCWcAnQBDvaeQAD+/FfXIVcj1wAAAA=="
    ),
    (4, 1): (
        "UklGRk4AAABXRUJQVlA4WAoAAAAQAAAAAwAAAAAAQUxQSAUAAAAAIiUoKwBWUDgg"
        "IgAAAHABAJ0BKgQAAQACADQlnAJ0AUAAAP75VePhoIBIeJgAAAA="
    ),
    (4, 2): (
        "UklGRlIAAABXRUJQVlA4WAoAAAAQAAAAAwAAAQAAQUxQSAkAAAAAIiUoKyksLzIA"
        "VlA4ICIAAABwAQCdASoEAAIAAgA0JZwCdAFAAAD++KE7T6CASHjLgAAA"
    ),
    (4, 3): (
        "UklGRlQAAABXRUJQVlA4WAoAAAAQAAAAAwAAAgAAQUxQSA0AAAAAIiUoKyksLzIw"
        "MzY5AFZQOCAgAAAAsAEAnQEqBAADAAIANCWcAnQBDv4C7AD+/Gm0yssKAAA="
    ),
    (4, 4): (
        "UklGRloAAABXRUJQVlA4WAoAAAAQAAAAAwAAAwAAQUxQSBEAAAAAIiUoKyksLzIw"
        "MzY5Nzo9QABWUDggIgAAALABAJ0BKgQABAACADQlnAJ0AQ72nkAA/vwDYx9MrLCg"
        "AAA="
    ),
    (5, 1): (
        "UklGRk4AAABXRUJQVlA4WAoAAAAQAAAABAAAAAAAQUxQSAYAAAAAIiUoKy5WUDgg"
        "IgAAAHABAJ0BKgUAAQACADQlnAJ0AUAAAP75JlHbp6CASHjLgAA="
    ),
    (5, 2): (
        "UklGRlQAAABXRUJQVlA4WAoAAAAQAAAABAAAAQAAQUxQSAsAAAAAIiUoKy4pLC8y"
        "NQBWUDggIgAAAHABAJ0BKgUAAgACADQlnAJ0AUAAAP74aWrYF6CASHjLgAA="
    ),
    (5, 3): (
        "UklGRlYAAABXRUJQVlA4WAoAAAAQAAAABAAAAgAAQUxQSBAAAAAAIiUoKy4pLC8y"
        "NTAzNjk8VlA4ICAAAACwAQCdASoFAAMAAgA0JZwCdAEO/gLsAP78abTKynAAAA=="
    ),
    (5, 4): (
        "UklGRl4AAABXRUJQVlA4WAoAAAAQAAAABAAAAwAAQUxQSBUAAAAAIiUoKy4pLC8y"
        "NTAzNjk8Nzo9QEMAVlA4ICIAAACwAQCdASoFAAQAAgA0JZwCdAEO9p5AAP78A14a"
        "zWjcAAAA"
    ),
    (6, 1): (
        "UklGRk4AAABXRUJQVlA4WAoAAAAQAAAABQAAAAAAQUxQSAcAAAAAIiUoKy4xAFZQ"
        "OCAgAAAAsAEAnQEqBgABAAIANCWcAnQBDv4C7AD+/Rr0UgnlQAA="
    ),
    (6, 2): (
        "UklGRlgAAABXRUJQVlA4WAoAAAAQAAAABQAAAQAAQUxQSA0AAAAAIiUoKy4xKSwv"
        "MjU4AFZQOCAkAAAAcAEAnQEqBgACAAIANCWcAnQBQAAA/vgPlVxz3oIBIeMuAAAA"
    ),
    (6, 3): (
        "UklGRloAAABXRUJQVlA4WAoAAAAQAAAABQAAAgAAQUxQSBMAAAAAIiUoKy4xKSwv"
        "MjU4MDM2OTw/AFZQOCAgAAAAsAEAnQEqBgADAAIANCWcAnQBDv4C7AD+/Gogj6eZ"
        "AAA="
    ),
    (6, 4): (
        "UklGRmIAAABXRUJQVlA4WAoAAAAQAAAABQAAAwAAQUxQSBkAAAABmYzof0BB2zZM"
        "93mMP8sPIWICJiCLGh4AAFZQOCAiAAAAsAEAnQEqBgAEAAIANCWcAnQBDvpgYAD+"
        "/ANhq0yssKAAAA=="
    ),
    (7, 1): (
        "UklGRlIAAABXRUJQVlA4WAoAAAAQAAAABgAAAAAAQUxQSAgAAAAAIiUoKy4xNFZQ"
        "OCAkAAAAcAEAnQEqBwABAAIANCWcAnQBQAAA/vi/G4bjr4JBghyVAAAA"
    ),
    (7, 2): (
        "UklGRlgAAABXRUJQVlA4WAoAAAAQAAAABgAAAQAAQUxQSA8AAAAAIiUoKy4xNCks"
        "LzI1ODsAVlA4ICIAAACwAQCdASoHAAIAAgA0JZwCdAEO/EhAAP78w+F6cTy5gAAA"
    ),
    (7, 3): (
        "UklGRl4AAABXRUJQVlA4WAoAAAAQAAAABgAAAgAAQUxQSBYAAAAAIiUoKy4xNCks"
        "LzI1ODswMzY5PD9CVlA4ICIAAACwAQCdASoHAAMAAgA0JZwCdAEO/gLsAP78aisx"
        "PQH5AAAA"
    ),
    (7, 4): (
        "UklGRmQAAABXRUJQVlA4WAoAAAAQAAAABgAAAwAAQUxQSBkAAAABmYzof0BB2zZM"
        "u8tj/GFeCBETMAFVtekHAFZQOCAkAAAA0AEAnQEqBwAEAAIANCWcAnQBDvshtAAA"
        "/vwDYfmJIuLtQAAA"
    ),
}

# named 48x32 vectors at different qualities / content classes;
# 'alpha' is a VP8X still with a compressed ALPH plane
_FLAG_B64 = {
    "alpha": (
        "UklGRrgEAABXRUJQVlA4WAoAAAAQAAAALwAAHwAAQUxQSBkAAAABmYzof0Bt2zaM"
        "W8r/Z2fOEDEBE4Bxfb1zAFZQOCB4BAAA8BMAnQEqMAAgAAJAOCWwAnTKEEBGhXgc"
        "ADlivUB+um8A8470RP9J7AH9L9QDytPYL/bj92PgH/af//4II0EzF/Eb4SIFWA5A"
        "jgZNXiA+rvPZ3g3zn+xec/1Mv3r/p/3b+3egj8i/qf/j/u3wBfyz+pf871VfW1+l"
        "/sO/queeF8dayK+5kYsZo7kfIeMZpfg9VH9XY2d8zSNxldN/fDsmuKF3Qn6kRkWA"
        "AOE+f+Ut+MHDy6YYlbjw5KKXoeEHZlLCVR/UQXpob9E+slu/BQtn9zM4aF1s8l13"
        "doWWO9TBCC+VwimEy5j74pnk2oa9eY/BO038/Tc75ZMrdkfte9E0NOegVxi2ZioQ"
        "/bd3KLkkhxoj4eHTv5OvioOtku7f+JaGOptKi5Qc6Dz5P4CoZOtu6WCARZDXe5wy"
        "L/QeMQ9/J0WXI+sVH27Yl7ZZrY/vWOmmjQgP/VI+vJZ+SBdysKNnWAq9dlC5zV84"
        "/KeHvg4zdVTrM2WE0LHfy9XHlCMbAj/PrMwTasoXurm/+mirgjwaSRoo10UyJJrt"
        "/a3PdrgaxC7hAx58UTBbGvobiDEb1wmLhnett1fCryuo4Pfb07wKVKAbltTVaNpq"
        "D1I+nYB409V2qRZ37JqwYSojZ9zxzw96Vrmr9nHfk06YUzVlYt1WhUWgomUv5Trl"
        "WYl4krHfTGGH6IKBFaTd5K6S8ufT3HYpyApBWsKb/Jje4uM7klnseArHtMo8brax"
        "vKK7xJwtVDBSz9ALjRK8aQi42ewHz8xvmlrtBy+/7g2d3HSf/poi7CfGmfFb8URn"
        "z4xB/Yn+tVNUuDqPfLUz0rwq6x+VZl+cZvCRbwtk+G8G89Gt7BrnZ0/eRMwhhQaB"
        "jzWM2eHTYCxXDhFacPWGb3QD6EZVPhMj0HvP3Jvh/cuN7PB9Yt40Q/h37vYNLPh6"
        "QyEBPMoF3Hm7TZdXR6PDqW/TvA3h4owMYgzdz5ZQWCY3F56hgZsMq7Q2gBh3cwsD"
        "XoGet2MAkdUh7aYUggcC/bIHfp18oT73GuGz+Nn/b8qu5s1OCKfMceiPeB/cBmC5"
        "XaEfogtQlQtdnkfaZsFPBBW+dvuAv9LX9mnd7lekAkax7i2oyP2JtcAFjaeOepzc"
        "kGX887By9s5rh0ckw5EjDjzE3Za6zwKGeQZXw8mfZZSpxX5oF/yLaIBU2h/9YeJF"
        "m5X9/RWVGVtKv6KhT/c138xZbuExEwuDAk1Drj9KmrcuV5Y9ro8YrlHrAT6ydghu"
        "HROQ2OeIEyrE834s0PhNa6Qvy9oQWzfUoPG8s4KnpbokrXJ5sFxTBDeHoKT+e3CA"
        "29WvNni2tof+37O7W+umj07HTnTe7xo4ZE4elgkXhCCAhNq4eNUjow28aGl50SVT"
        "sx+ghwbmp4lKnztCG7NyY2zYVZiP6KBp2KuWCjUpPCIsscXLZnk5UvN6dEUoPlxb"
        "BBR/Ku++vPVyqL2BE3i2In1kiW/6UFxRvA628nOodvL/2ZeghCaDxRB8im0/Xrfm"
        "OYvH2xn4aVzVQr3c2QAAAA=="
    ),
    "gradient": (
        "UklGRpAAAABXRUJQVlA4IIQAAABQBACdASowACAALmlIpFI0JaWllABoS2AEFRjU"
        "+IptQJuD55g4JJ5iHv6AAP6O+Ke0YFHnOk3G/P/4d5KU7QX//2u+h9HGL98Gpns7"
        "KvkrB/oIliMYDD9ExJmAeNOpl9ctnIvGptMDmOXt3ZER/57QUXzuEwUww3Q+SJKV"
        "oEnkeeIKQAA="
    ),
    "mixed": (
        "UklGRvAAAABXRUJQVlA4IOQAAABQBgCdASowACAAPxF+slIsKKSiqrgMAYAiCWgA"
        "xyY3YHHZICNBCAaot7p6AANLORAI1VSelGM73VxXYADOC1wgym3EIHsV5CTeiOSj"
        "wI+K67PGQNrrFtAPuexyiVJhHI5R9/GnxnqTHpMrUIEc3oY5cjiT5Vrf9bjDhsAn"
        "4bJCd3c9VsEAYttxvGkFMAReiCwJddpjJfosUZdvQT4B9ApZa/jDX/DyEd0TZQVT"
        "3glImT0Usz6d55X5i0j7KRxrzN/Uea2MQbA580yOwUrPdtNlEB20Uh1MCjEF8PnA"
        "ai4AD0ZWAAA="
    ),
    "noise": (
        "UklGRoQDAABXRUJQVlA4IHgDAACQDwCdASowACAAA4BaJbACdMoSylUB+T0AvwO0"
        "b6ANsBz0HoA/0fS+eoBvCH91tARoJnWICvAqy7IEcCuApCL9m8Ab6j5UPVC/fv2b"
        "8yPz5+xPwCeVh6y/2L9lP9pDWotm//ZIMapT1evnm6t5oJ6yZZW/KOh2guwkY1JU"
        "YG33XD01LtGAAPlA3h614yVsA8wqff6fUnsJg0AmPHkF1F4/iGbj2B6oZkGVO5Nb"
        "BHjjN2BIwHDO5bx7KD7dReIWHiL4UQ9oqIfWtxAcwtESD3l0HF00nPvjR4IzpJ1v"
        "B0ukWrAvGB6zbFLWir704eRXyPIunlc9AIrbmDn7pEgu7tQlXvqWfzyIoHEI+Wul"
        "g6m8VIJnWRy4d0FtG3RC/aokdwI9SeB85xpL/ZtOO2yaZ5bWLON5uI1cL4mC1VGS"
        "KNw+o5XT3qGo6/tcZgF023TOIN0FES8LgGbcGYubR3JvuUolCJSlo5DgyrYlFHw9"
        "vJhkGt81uN9Lh+jlM/Pa8hIXVb0TdA6nI36cKsc9U1JC+M6f/KXYJWv9BOyCdIOt"
        "P9n1jDnjVL2oR/lCHCTwttVU3WBF4ZQ7pPT7Az4MhVqLm5bQ6JwIFc0JwKeyyvOh"
        "gOPRYIEk9fTP69GkZOSOOSrIQvUv4DBtsbxR6L16qeOfp5zNaax0+d+IksXtevZA"
        "UssdCrBcGycwD+5RGWl+yB+XoUhadZcHj2dU3Jz4+SXrfy7Q8ejfAIczqxN/2EhJ"
        "8fcp2w0YG6jSY+5FsqbzaE3AgXQYZPHhPJ2APs/33OU3gdcu8o7eBzH4EnFAH8Gb"
        "jju1QKWz4JnvqyweUrFlz1bQQO3hSqyyfhpOSbS/ln5he59+65tv9A5huHpUrWu/"
        "bvabzYUelPs7N+a8xGvTs1YMFJow6gS+vnSBLZPW0sNY4IL0+qU0N/NmqzQJGsYy"
        "DqozrMoj429s+OvVEzonrTAXEi8cb5HQX3rr6FBA8uWync08FijD1rbtaO5BXJlX"
        "Ogv4SmTaB5wGvkFmUWrMQSdm+vUYWg6ieDVDBzRQaFgq/3y2ryc4Jg2Nmlna5oJP"
        "ojUp5PcAI74j3/C7zDhUt+TjUcN/SwhV7EPw6iMXR6OC6XNMb9x9658T6M3l6NQR"
        "nP3vRR9U4BL0f/IZvPIMuzJnB2HXL5hSX1U8DHxFzn1tM6rK1sKH2qCoAAA="
    ),
    "smooth": (
        "UklGRvgCAABXRUJQVlA4IOwCAAAQFQCdASowACAAPjEWiUOiISEVXAQAIAMEtgBO"
        "mUI4G9Q/F32BKJ/EvvlkgfM39r+5ztAfjP+ge4B+k398/kv4q9wDzAfoB/kv8B2A"
        "PQA/rH9e9Tn+k+wB6AH8A/k///9jX+2f9L/B/BZ+2f7QfAb+p//K/P+8ifiN0AJ4"
        "F9y8if4B+M34q1+xp/p5/1X/Sawb/M/bkg9HjuV3S+f4Axo2Qt8M7y1g068qU7Aw"
        "9FguUwAA/vxKw7UFqpeswc/quDgVgPoUp8otX5fiL7xk8Lz3Pkjna//8/lIIugQn"
        "NImvnCEe9iVpYVL/AEcxuRIKznSY//5ZqcSda2v8/cff8R9euWjOJI2tetyQwiK7"
        "ST7PiHXzPWHWhf/+3Bty1/I5V79Qcp41LrtWo97EjDu/BARA3Z5z7/ix+8/svCLT"
        "y8GP3/1A+s2Gc/Wf/cgMwiOJuOvEU9TB3iVETAbcgOc/uhlFg7qaUYUw2dI4J2DM"
        "f510/rldT/XJok3Omx3H+a4+fu0+Tf5+Hg1EMimaPFQIfDTULqy7PcsPx9JMrYsZ"
        "HEcwTKAPS+n0Q3A4Tn3QYFbQ1Pu79Ye6V9w4o5DpQ9evaAEV/G2of1/muYHqf3vi"
        "zEo2Q0tvis2ZzCGrFliuwDt5sWKtrcwg01xIgnLXbLAZ9+RH27Az2w9l9viFewqv"
        "2ebYFR59xckfZdurqJZMoZMzGMbr/DdPm2yZen+8TvXVZc3JqbQhlxLVA6x9I3CE"
        "Xlge5ORfikEf5Ub05R/m9KsRn4YkptlH4ZdcDK0qstxttzrquUZj3KFighte59yG"
        "REi2TIlHFrtJdHcbSs4WBr+LZM9cknJGBwCcU8R/cu6j92oPTuVrxrBxaf5WrI1P"
        "b869wRy/2H3PfVjeqoXBf91wmvPF4/6DZd/iG8nvO32CfxysQI5xXeql3Ve0rT9D"
        "TZ2RL22glP6FnUfGkXwXdpcs5k1kfQ30TtO11isiNHk4p2WTjgPRwPjy84C+AAAA"
    ),
}

# decoded-plane ground truth (captured with the libwebp cross-check);
# a_sum is the decoded ALPH plane sum (opaque 255*48*32 when absent)
PINNED_STATS = {
    "alpha": {"width": 48, "height": 32, "y_sum": 192446, "u_sum": 48210, "v_sum": 48662, "y_sha8": "4a1b88e5", "a_sum": 193536},
    "gradient": {"width": 48, "height": 32, "y_sum": 187680, "u_sum": 43864, "v_sum": 50015, "y_sha8": "68b83152", "a_sum": 391680},
    "mixed": {"width": 48, "height": 32, "y_sum": 185305, "u_sum": 49138, "v_sum": 49133, "y_sha8": "6a8e57a4", "a_sum": 391680},
    "noise": {"width": 48, "height": 32, "y_sum": 191288, "u_sum": 48775, "v_sum": 49224, "y_sha8": "ccd98041", "a_sum": 391680},
    "smooth": {"width": 48, "height": 32, "y_sum": 193077, "u_sum": 49259, "v_sum": 47922, "y_sha8": "e70843d9", "a_sum": 391680},
}


def yield_lossy_blob(w: int, h: int, alpha: bool = False) -> bytes:
    """Real lossy-WebP bytes for the given tiny dimensions (w 2..7,
    h 1..4 — the yield scorecard's generator range); ``alpha=True``
    returns the VP8X + compressed-ALPH variant of the same dims."""
    table = _YIELD_ALPHA_B64 if alpha else _YIELD_B64
    return base64.b64decode(table[(w, h)])


def flagship_blob(name: str) -> bytes:
    """One of the named 48x32 pinned vectors ('alpha', 'gradient',
    'mixed', 'noise', 'smooth')."""
    return base64.b64decode(_FLAG_B64[name])


FLAGSHIP_NAMES = tuple(sorted(_FLAG_B64))
