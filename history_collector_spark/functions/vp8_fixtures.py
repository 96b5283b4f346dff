"""Pinned lossy-WebP (VP8 key-frame) fixture blobs.

Every blob here is REAL libwebp encoder output (WebPEncodeRGB over
deterministic synthetic images), captured once and embedded so the query
path needs no encoder at runtime. The from-scratch decoder in
functions/vp8.py decodes each one to YUV planes bit-exact with libwebp's
WebPDecodeYUV (asserted at capture time and re-asserted by the interop tests
when libwebp is present). PINNED_STATS holds the decoded-plane ground truth
used by the multimodal_decode_vp8 oracle: any decoder drift flips a hash.
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

# named 48x32 vectors at different qualities / content classes
_FLAG_B64 = {
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

# decoded-plane ground truth (captured with the libwebp cross-check)
PINNED_STATS = {
    "gradient": {"width": 48, "height": 32, "y_sum": 187680, "u_sum": 43864, "v_sum": 50015, "y_sha8": "68b83152"},
    "mixed": {"width": 48, "height": 32, "y_sum": 185305, "u_sum": 49138, "v_sum": 49133, "y_sha8": "6a8e57a4"},
    "noise": {"width": 48, "height": 32, "y_sum": 191288, "u_sum": 48775, "v_sum": 49224, "y_sha8": "ccd98041"},
    "smooth": {"width": 48, "height": 32, "y_sum": 193077, "u_sum": 49259, "v_sum": 47922, "y_sha8": "e70843d9"},
}



def yield_lossy_blob(w: int, h: int) -> bytes:
    """Real lossy-WebP bytes for the given tiny dimensions (w 2..7,
    h 1..4 — the yield scorecard's generator range)."""
    return base64.b64decode(_YIELD_B64[(w, h)])


def flagship_blob(name: str) -> bytes:
    """One of the named 48x32 pinned vectors ('gradient', 'mixed',
    'noise', 'smooth')."""
    return base64.b64decode(_FLAG_B64[name])


FLAGSHIP_NAMES = tuple(sorted(_FLAG_B64))
