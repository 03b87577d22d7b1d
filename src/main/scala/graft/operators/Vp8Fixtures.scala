package graft.operators

/** EXTERNAL lossy-WebP conformance fixtures embedded for the declared
  * query surface: four system-libwebp encodes of known pixels plus
  * CPython's python.webp (VP8X + VP8L-coded ALPH + VP8), with the
  * EXPECTED planes pinned from libwebp's own decode (and, for the
  * alpha plane, the sibling PNG's tRNS alpha — cwebp encodes alpha
  * losslessly, so the two independent encoders must agree exactly).
  * Regenerate with tools/gen_vp8_fixtures_scala.py. Expected layout:
  * Y (w×h) ++ U ++ V (ceil(w/2)×ceil(h/2) each) [++ A (w×h)]. */
object Vp8Fixtures {

  final case class Fixture(
      w: Int, h: Int, fileB64: String, expectedB64: String) {
    lazy val file: Array[Byte] =
      java.util.Base64.getDecoder.decode(fileB64)
    lazy val expected: Array[Byte] =
      java.util.Base64.getDecoder.decode(expectedB64)
  }

  private val file0: String =
    "UklGRkAAAABXRUJQVlA4IDQAAACwAQCdASoQABAABUB8JbACdADwFppgAP7kIamFL8XqRdW0" +
    "D/2xx49lYQ3Xj5v9/DzuAwAA"
  private val exp0: String =
    "LS0wMjY4PT4/QEZJTVBUVDQ0Nzk9P0RFRkdNUFRXW1s+PkFDR0lOT1BRV1peYWVlRERHSk5R" +
    "VldYWV9iZmltbUpKTVFWWV9gYWJoa29ydnZQUFRYXWFnaGlqcHN3en5+WlpeYmdrcXJzdHp9" +
    "gYSIiGBgZGdscHV2fX6Eh4uOkpJmZmlrcHJ2douMkJOXmp6ebGxvcXV3enqWlpqdoaSoqHZ2" +
    "eXt/gYSEoKCkp6uusrJ+foGDh4mMjKiorK+ztrq6h4eKjJCSlZWxsbW4vL/Dw4+PkpSYmp2d" +
    "ubm9wMTHy8uamp2fo6WoqMTEyMvP0tbWoaGkpqqsr6/Ly8/S1tnd3cTExMR/f39/vLy8vHd3" +
    "d3ewsLCwbGxsbKioqKhsY2NjcnJ2eXWChoZpaW1xdnp+fl5eYmVqbnJyVlZaXWJmampqepKi" +
    "vcXR2WJyipq1vcnRVmd+j6mxvcVNXXWFoam1vUJSanp/h5ObOUlgcXd/i5MtPVVla3N/hyU1" +
    "TV1ja3d/"
  private val file1: String =
    "UklGRqwAAABXRUJQVlA4IKAAAADwBQCdASowACAALmlIpFI3JaWllwBoS2AZIDPAH2AfYBFl" +
    "fTbY9V/DPl7dVwVXosCb9D/NAA39sAD+/Q2sj2y5V5L9orVz/9hBgOACbpdx/FWk/5GVeaER" +
    "zl//RS/pX352e76WqFw8DvK9iStnf0crXPe/uwPEYEU4KTRf00R3VOfYcwP9kodqJyQ5eq4E" +
    "u55tdAkiSDlbt9ojG2j0nAAA"
  private val exp1: String =
    "JCQlJigpKikoJygoKSsuMTM2OTw9Pj89PDs8PT9CRUhKTVBTVFVWVFNSU1RWV1hYJycoKSss" +
    "LSwrKisrLC4xNDY5PD9AQUJAPz4/QEJFSEtNUFNWV1hZV1ZVVldZWltbKyssLS8wMTAvLi8v" +
    "MDI1ODo9QENERUZEQ0JDREZJTE9RVFdaW1xdW1pZWltdXl9fLy8wMTM0NTQzMjMzNDY5Oz9B" +
    "REdISUpIR0ZHSEpNUFJWWFteX2BhX15dXl9hYmNjNDQ1Njg5Ojk4Nzg4OTs/QUNFSUxNTk9N" +
    "TEtMTU9SVlhaXGBjZGVmZGNiY2RmZ2hoODg5Ojw9Pj08Ozw8PT9CRUdKTVBRUlNRUE9QUVNW" +
    "WVxeYWRnaGlqaGdmZ2hqa2xsPDw9PkBBQkFAP0BAQUNGSUtOUVRVVldVVFNUVVdaXWBiZWhr" +
    "bG1ubGtqa2xub3BwPT09P0FCQ0NDQ0VFR0lMTU5QUlRWV1hYWFhaW1xfYmRlZmlrbG1vbm9v" +
    "cHFzdHV1PDw8P0JCREZISk5OUFFRUVFRUlNVVllbXmBjZGVmZ2dnaGlqa2xwcXR2eXp8fX5+" +
    "PT0/QkVFSEtOUVVWWFhYV1dWVlZYWV1gZGdrbG1tbm1tbG1tbm9zdnp9gYKEhYaGQUFER0pK" +
    "TVBTVlpbXV1dXFxbW1tdXmJlaWxwcXJyc3JycXJyc3R4e3+ChoeJiouLREZJS0xMUFNWWV1e" +
    "YGBgX19eXl9hYmZpbXB0dXZ2d3Z1dXV2d3h8f4OGiouNjo+PRklNTk9PU1ZZXGBhY2RkZGNi" +
    "YmNlZmptcXR4eXp7e3t6eXp6e3yAg4eKjo+RkpOTSk1QUVJSVllcX2NkZmdnZ2ZmZmdpam5x" +
    "dXh8fX5+f35+fX5+f4CEh4uOkpOVlpeXUFJVVldXW15hZGhpa2xsbGtra2xub3N2en2BgoOD" +
    "hIODgoODhIWJjJCTl5iam5ycWFlbXF1eYWJkZmlqbG1tbW9vb3FzdHd5fH6BgoODhIOGhoeI" +
    "iYqNj5KUl5iam5ycY2RlZmdoaWlpaGlqbG9xc3R2d3p8fX9+fn6AgYKFiImLjI+RkpOVlJSU" +
    "lpeZmpubamprbG5vcG9ubW5vcXR3eXt9gIOFhoeFhIOEhYaJjI+RlJeam5ydm5qZmpudnp+f" +
    "bm5vcHJzdHNycXJzdXh7fX+BhIeJiouJiIeIiYqNkJOVmJuen6Chn56dnp+hoqOjcnJzdHZ3" +
    "eHZ1dHV2eHt+f4KEh4qMjY6Mi4qLjI2Qk5WYmp6hoqOkoqGgoaKkpaamdnZ3eHp7fHp5eHl6" +
    "fH+ChIaIi46QkZKQj46PkJGUmJqcnqKlpqeopqWkpaaoqaqqenp7fH5/gH59fH1+gIOGiIqM" +
    "j5KUlZaUk5KTlJWYm56go6apqqusqqmoqaqsra6ufn5/gIKDhIKBgIGChIeKjI6Qk5aYmZqY" +
    "l5aXmJmcn6Kkp6qtrq+wrq2sra6wsbKygICBgoSFhoWGhYeIio2PkZKTlZiam5ycnJyen6Cj" +
    "paeoqqyvsLGysrKytLW3uLm5gICBgoSFiImMjZGSlJWWlpWWl5iam56go6WoqaqrrKysra6v" +
    "sLG0trm7vr/BwsPDgoKDhIaHi42Rk5eYmpqbmpqZmpqcnaGkqKuvsLGxsrGxsLGxsrO3ur7B" +
    "xcbIycrKhoaHiIqLj5GVl5ucnp6fnp6dnp6goaWorK+ztLW1trW1tLW1tre7vsLFycrMzc7O" +
    "ioqLjI6Pk5WZm5+goqKjoqGhoaKkpamssLO3uLm5urm4uLi5uru/wsbJzc7Q0dLSjo6PkJKT" +
    "l5mdn6Okpqenp6alpqaoqa2wtLe7vL2+vr69vL29vr/DxsrN0dLU1dbWkpKTlJaXm52ho6eo" +
    "qqqrqqqpqqqsrbG0uLu/wMHBwsHBwMHBwsPHys7R1dbY2dralpaXmJqbn6Glp6usrq6vrq6t" +
    "rq6wsbW4vL/DxMXFxsXFxMXFxsfLztLV2drc3d7emZmam52eoqSoqq6vsbGysbGwsbGztLi7" +
    "v8LGx8jIycjIx8jIycrO0dXY3N3f4OHhysrCuqajoKarsbaumJCVm6Cmq6OKfX19xsa+tqOg" +
    "naOorrOrlY2SmJ2jqKCHenp6wsK6sp6bmJ6fo66mkIiNk5SYo5uCdXV1srKuqp2dnJ+cm6Gc" +
    "j42RlJCQlpCCe3t7l5eanZ+cmpSWlIyMlJONiIqIgICHioqKh4eOlZ+fnpeTjoCDlZiRioeC" +
    "dXiHkZGRgoKJkJqamZKKg3t+kJOMhX53cHOCjIyMiYmMj5GPjYeIg39+hoWAe3t3c3N4fX19" +
    "mZmVkYSCgYOGiImDd3J1d3l7fHZpYmJioKCYkHx5dnyBh4yEbmZrb3V5fnZgU1NTm5uTi3d0" +
    "cXd4fId/aWFmamxvcnFbTk5OjIyHg3d3dnl2dXt2aWZqbWlpaWlcVVVVcHBzd3l2dG5wbmZm" +
    "bm1nYmNhX1tiZ2dnYWFob3h4d3BsZ1lcbnFqY2BaVVFjbW1tXFxjanNzcmtjXFRXaWxlXldQ" +
    "SUxeaGhoWFhfZnBwb2hgWVFUZmliW1RNRklbZWVldnp/g4mOk5ebn6SrtbzBwsLEydDb4ebq" +
    "b3N4fYWKj5KVmZ6krrW6vL2+w8rV2+DkZmludX+Gi4yNj5SapayxsrK0ucDL0dbaYGRpb3l/" +
    "hIaIio+UnaKnqq2wtbvDyM3RXmFma3B0eX6Dh4yQlJecoqqwtbe6vcLGXF9kZ2puc3h/hYqM" +
    "jpCVnKeus7S0tru/V1tgY2VpbnN6gIWHiYuQl6Kprq+vsba6UFNYXWBkaW50eX6BhYiNk5uh" +
    "pqmrrrO3RUhNU1pfZGdrb3R5f4SJjZGVmp+lqq+zPkFGTVVbYGNlaG1ze4GGiYuOk5mhp6yw" +
    "OT1CSFBWW15gY2hudnyBhIaJjpScoqerNTk+Q0pPVFdaXmNob3R5fYCFio+Vmp+jMTQ5PEBD" +
    "SE1TWF1hZWluc3qAhYiMj5SYLTA1ODk8QUZNU1hbXmFmbHV8gYOFh4yQKCswMzQ3PEFITlNW" +
    "WVxhZ3B3fH6AgoeLJCgtLzEzOD5FS1BTVlleZG10eXt9f4SI"
  private val file2: String =
    "UklGRqYAAABXRUJQVlA4IJoAAADwBQCdASolABUAPq1InUm7JL+hKq378BWJbACdMsI158B+" +
    "OXJUb8d5gCaGlvyZfCu/9yvRQbN+AAD+9Za9AxH7Pg2rMwf+SrLNoQJq5j2USdabQAJ3AOtf" +
    "W9o/We/VZC3G+9kLs4av/xJmbKp/bSr//ThoiuNAABfC+HZ7OPXzOdoJbX7P1rqoBhmKuujD" +
    "SnCVxmxh31jGFAAA"
  private val exp2: String =
    "JSUmJygpKioqKissLTE1ODs+QUVJSkpJSUhKS0xQVFdZXF5hZCoqKywtLi8vLy8wMTI2Oj1A" +
    "Q0ZKTk9PTk5NT1BRVVlcXmFjZmkwMDEyMzQ1NTU1Njc4PEBDRklMUFRVVVRUU1VWV1tfYmRn" +
    "aWxvNzc4OTo7PDw8PD0+P0NGSU1PUlZaW1taWllbXF1gZWdrbXFzdT4+P0BBQkNDQ0NERUZK" +
    "TlBTVlhcYWJiYWFgYmNkaG1vcnR3e3xEREVGR0hJSUlJSktMUFNWWFtdYWZnZ2ZmZWdoaW1x" +
    "dHd6fICCS0tMTU5PUFBQUFFSU1daXV9iZGhtbm5tbWxub3B0eHt+gYOHiU9PUFFSU1RVVldZ" +
    "WlteYmNmZ2ttb3BycnNzdnd4e3+BhIaIiotSUlNUVVZZXF5gZGZoaWxsbW1wcXJzd3l8foKD" +
    "hYeIiYmKjI2OVlZXWFlaXmFkZ2xucHJzc3NzdHV2d3x/g4aKi42Oj4+Pj5CQkV1dXl9gYWVo" +
    "a25zdXd5enp6ent8fX6DhoqNkZKUlZaWlpaXl5hiYmNkZWZqbXF0eXt8fn9/f3+AgYKDiIuP" +
    "kpeYmZqbm5ycnJydaGhpamtscXR4fIGChIWGhoaGiImKi5CTl5qen6Gio6Ojo6SkpW5ub3Bx" +
    "cnd6f4OIiYqLjIyMjI6PkJGWmZ2gpaanqKqqqamqqqt0dHV2d3h9gIWJjo+QkZKSkpKUlZaX" +
    "nJ+jpqusra6wsK+vsLCxfHx9fn+AhIaJjJCRkpOUlJeXmpucnaKkp6mtrq+wsrK0tLW1toaG" +
    "iImLjI+Pj5CSk5SXmpyen6Omp6iqqqurrq+wsbOzwsTHycqPj5GSlJWXl5iYmZqbnqKkp6mu" +
    "sbKztbS0s7W2t7i6usjKzc/QmJiam52eoKCgoKGio6aqrK+xtrm6u728vLu9vr/AwsLP0dTW" +
    "156en6KkpaempqWmp6irr7K0t7q+wMHDwsLBw8TFxsjI1NbZ29ygoKKmqaqqqamoqqutsbS3" +
    "uby+wsbHx8bGxcfIycrMzNrc3+HiyMjAuKGem6GmrLGpkIiNkZeboMPDu7OcmZacoaespIuD" +
    "iIySlpu8vLSslZKPlZWgpZ2EfIGFho+UqqqloZKRkZWPlJaQgX6BhX6EhYuLjZCRjYqEiIB9" +
    "fIF/eXN3cGx5eX+Fjo2MhIJ1bnB/gXpzcGRdcnJ4foeGhX12bmdpeHpzbGRdVnZ2eHt9endx" +
    "cmxoZ2xrZWBfWFGCgn55bmxqa25ucGpbUVBOa2trh4d/d2ViXmNobXFpUENDQ2dnZ4KCenJg" +
    "XVleY2hsZEs+Pj5iYmJ1eoGJk5uipqmttLvFzdTW1dbca3B3foiQmJyfo6qxu8PKzc7Q1V1i" +
    "aXB6gomOkZWco621vMHEx81XXGNpcnmAhIiNlJukq7K3vcLHVVpiZmtwd32DiZCVnKKpsLe9" +
    "w09UXGBjZ250fIKJjpSZoKevtbtBRk1RVFlgZm50e4CGi5KZoaetNTlARUpOVltiaG91e4GI" +
    "jpedoyktMzlCSE9TWF5la3N5gIaNkJQjJywzPkZLT1NYX2ZudXyBgoWJHiEnLjlBRkpOU1ph" +
    "aXB3fH2AhA=="
  private val file3: String =
    "UklGRnwNAABXRUJQVlA4IHANAABwMQCdASpQADAAAMASJbACdMoR2j6X+S3sCU9+qfgfaEo7" +
    "8gTkv/g+eD1AfkD2AP1f/1/ojfsB7gP5l/YfUB/Iv69/ov9B7HX6ue4D9H/15+AD9J/UU/qv" +
    "sAfrt7AH88/rv/o9jH+2/9r/SfAJ+uP/U/y37//QF/L/67/0Pz//8P0AegB6AG8C7wvsngD+" +
    "F/Gf0b8hv6l+zXKE5Z/1XoB/HvqJ9+/sflx/cvAH2R/t/qBfin8X/rf5Ffl78IHkf9s7Qqjv" +
    "+Q9QL1H+Sf3H8u/8l5/GoF2g/yXuAfxr+Vf6Xzo/nP+e8Qb5J/Ov7r92P2AfyD+Y/5H+0flL" +
    "9HH7d/vP75+5P+d9hf5V/UP9v/h/3a/zH2A/xz+b/5P+zf5X/tf4D///+/7bvVJ+u/sOfpz9" +
    "9x5IwvSGTwtuOhvxLdrnxhKkb6AJa71xPe9LYq0N1s4o+ZukD2MY0OUD5PWVEfOiAtPNNYqt" +
    "Q7CkrOAtsKO0c5Zvk7ZxxZ5digMrVRdUl3yHqsPZ+cvUJFD5SrIgDo1r3l6kYAD+/1poC6gx" +
    "hR+m1/ZIvA0F+lOHc017lkTqWY+dhJc6m2G5m5zvuc+r+0cV7XsDJbAy6a9kV17AMEuNY6G4" +
    "0J+rTerCPUNQaIQ5UcdIiiqfI8zSn7IE7QTiBv41sv2vPirPYZLxboCshfTJ29/wWa84n2Iu" +
    "nCzsE+pP/+2XKvt31BrEXSn7k2b/LsrgyzpU2jtsIW9rNJGkH/9wdZNpB73r+kNg8r3iP1eX" +
    "7FKrJbWNxwPPhAKermCQ02PLlInyJjl4o8urcdppeq4trVGrq/V5YA0DfW7fsau7kUPirmi+" +
    "WRDuiO4iCNSqkouD2LWD8R2tBEhfNqRQUFZ9bhajrRC6mdL0fOW8IFAQR7PwwsxrJokaMsio" +
    "XbaDM02oqDsGGts/erYgnY2CrhROHKuZ723DQe541dHzInFTlpsjiWItTg8nknb7vC0vTAc0" +
    "Qm6L0NnRpmkto+0khE8tVTR/4AOulcqFQuv1sllhLdGLzMj4i1beyR6GIelnv2aM810EatKB" +
    "YhwMFIgILIlY9r1or/hGYkbEQFAp5+i5lIKMXeBKTsCRBIOA9cvg6aU496hIG8owRONBEH8i" +
    "1s5xerqdyP7BiZLRKaUZlmfnb9tz2ggxJ1CeJMRp5SLQkTd1P8OIdXJep8tjROIjACgN9S6N" +
    "4e1G4Z4sxPgXga3eH0ZTDPa4NajaJn4aBnO7Y+6w07m6bbIxRBNoA3hAs1YN1YJJ8RXYc78c" +
    "uCF5CWEPWWSeTPO1mezuLlNQMqIi53hOkiCdQfrNcescFwbmk3HMf6gSekDJfdqblCR5xmPT" +
    "DDjAL+KAkX1P1pd7EZWNIVhwF95xlxG6Ejy1FBg44sc8svo8G8eGpyS/zlNQ2WgcEFaCn+Ss" +
    "q8JqVwpeLYKmk4Di30avu3/6Onxc7JbF7tJavp2nLZ1Otpoc1rjfOf645DVp0Lrj7thy2h3L" +
    "HRwAoNlK59fD9YyowTCZg0ek2SNiZ6jRzJQ0tKE/PgujmNk5bQYNa0dvQCJQsLZ8ll701MTa" +
    "m1jf1J7jGdBWIoR8zcrSNvR4tv4trGmrhH/2qV1Dzgs0NJiAGW7ZgTDolfLZGuuv1enMf/5o" +
    "nV8b6bg+DXOzU517+OX5C6yfT8rEz3Iwtia8exE0CanDweNmdIbxVZjUGCAytkd/79FAlM1h" +
    "J966oR4KdSiNlI/pPr4qXm0B71FWdY+g7ip55Ii92QQHcOryHZ7g2w9WLGK3z8SjNOr1PNk9" +
    "785Zbu5F3YPoWXuSr1e6nI63903bI7h6rqpkUcYWwoTJxN5RM6JSUntb1wM32ccCg8G9eTi3" +
    "SRq+9cBQ426ralojElBVFo5/f2LB/p/cINQ8GBcycIhmCpq1n45Sivf6AXuwTeYry1zhVz/F" +
    "VbW2oPRnQgAUrd+Iep9R/k3rwX4XuykzBHRxeBB8pS+dCXOdBvzQv7HeLpEdtImBx1OZTd75" +
    "pwB2niAoI5rhh7HZz/KM62r+tBwb1VY+uCNRq72+VdX00KoGp6sHHwKNvUn8nqDhdBTdPIOI" +
    "X+jfIuFefhlp/lu4WPBsbzcVoYfEzDoNXT2bapS4FoWysLqelRtgQhZs4MC0Bbb5d97mFmDO" +
    "ErYVcXb8gCD0rRUtoweBLnVZ8zrvac3SAsnGts67vyONJqBG+HmrwpV/l998djvSsS71DFiv" +
    "x+KpqphCw5K8W+QycPRPfTMfHY1+2kyGsGn+5sLcZ/rHuWdpIGsfZM2yBiNWo8Obtg+5D4PJ" +
    "gYvJeqpHv4yP+4pmqdJ4B/RWhSjiHvBBgWoMWGe9/cGGYRg/TBjVqQ8puZIDcC+rOFg3oqxC" +
    "JWoHs+w9UR5CsCMpVcZV3obcCr398To+t8ss1fCHpg7t6n+fWpi3+VumPxAcnycetrQh0J4M" +
    "xerxbmd6Py8LTosaeefvuJn2hbjhh8qONqvmhRsHSJ3LCkAjTzcXk411B2kW+A58mHSOQpmK" +
    "M4GGLSIwRipWOJn4O9QzJCsDk0K2SpjoiyrVkJ9bwm/0sKS7CVgcpe3PydGHAOjgbRlQAlQ+" +
    "ClSs5c16oxa5+yBEI5v2KQINjEraXpXVT/CdTgwzzdHaJj2wlorX6zi/+Uplrcqyk74SMgie" +
    "+XKCltG3YJWyqcNKm+UlqLbMXHs/6khV/Qgnh3Ss8jhXT3V4Xa/ziFI6fTm8/B76L+fZfr1o" +
    "IXJwX0GE/W/XUItKzm+ksrOQljF3Bui5Zj2akxu8TJaDVshR4zzY+3wSG/Kstst6XzwkWJUY" +
    "fUgdYURM2hpDCJH3ThSCipTob+p2f05HttmzyAVTN7z1wS9sbX8q8ZxGtH5LPxOHoDWhvM9/" +
    "/YlBsuhtbnQr02Y/dvsubvsbY4Icjiwab14MXLaS2wXKJ9mVqYSA4T6nZf6vk6Y8ePmyUxXw" +
    "Jund+epHcyWTMwDOMri5MWWxvT3TEDF7+kkr6MGur5mCNybVSIgGoA1DzIPF/8NOmsCsA3ia" +
    "hE5G07+BR9GM2GzPZXJVm+vI7igcPWSQ7J4perxdbDe7tWqjEpUmLkIY6vdHfww2BG9+8iZY" +
    "ZOwtT03ua1g0k9B6ooNr+8xaVYq1eeSyj8gHgaXIdzHuLP1019o/Dv93l38kFegLIvAIv2Tw" +
    "p6bTromm2rmscvzPnnucxcs91/AkcTitv7pweRqKZ8tugSq2SeyHWJH0AX/x8kIX1ARxrsao" +
    "Vm8bPTDMXdvdCe+r+xiv0ewqcPuFR+y3wm+A7SknipCvF/8DjR5V37OyE6Ht7ILtIzyDTn7N" +
    "RfyhdIg3njla/r5xb4gGzC1jV4vdVcLhOl1C7n8teDXgUX5WQwQLGo8ME8ypi0dZw+AfQ/6r" +
    "fOxLRmBUMgodmMsreHLfSyOdDjuiJU+oucqeuFVP6zMlyigi/BpMvlwnbkLOiH62PwCaGaCL" +
    "ITObO/vVhNjihrLrOdxPS9+Z1tMUiNlXwnRJ+3tHWMQHgQW/cXUZTFac0WPfRfyOhQvERlAx" +
    "0Cjr6jip+JDrfC1vT/Abbcq8JmdloYpblJZLVhLM4kEA/RqSuLB3J0aNv+4cBFAgC1N4q3oY" +
    "WqWhYgt0oh+ks0BmX++rw/Dt40N/1Ox2uQfOMdmgGTf156MmKOaPNujLk1zzguUaFCBwxdco" +
    "mbY+TNhLIHNmLI4bjCrBucHDyIdsgpj40vwjH+p3vO+79AYxogH2faGEVnzKOGSHjza+oFEA" +
    "JjT8veekuVuIyQ8q2yCeP2H3RzQpA2LrvHK+JzBxTU9AeEqCdRdBehBYf6lHW9Cl3xpk9S2K" +
    "C/aCZNhxyYtMlzv5n1bK5Jwskpk/yAcJ/cvAqRP4lddgRfGaeB6vyHDfFLmub6u50+UiUYvL" +
    "wlKvRz38Sypfa5bodN8ZxUCX5uw/w8Kwo2dpfuGRWugFVWM+f3ora6lEwJFBJy2Nls6F2IQE" +
    "Yj2YPtqcprlpBi1dn+ldb7lt6nOyF2RwAi7u8CsrN5LXrRNCfaOGUtYi8zYqBuhQ/pdknLot" +
    "21LGtoYSVVzeq9de66VX8srzyp5SgsyyEdinPkvNFKDFXBy7abovrEyCgZlO6gfAehqvN6dJ" +
    "sjWR8ltoOZKfBX1XMofsKxCbxvBqWAThmxOFsvL/6xjgW/pwuWMzMDrRZUNmSZgIqVbXX//g" +
    "DY32IZ5HTT8RUuPHJmTbQDSYfa2iHyeA6OGLix1eqUv6/IJ0g7c2CW184XjNOL7A+IW31nQy" +
    "iExPAkkxYfO5z5Wz/zzvHcrX5ZYIrJXFAInIKErIRCxDDebgvcE4CLVrBm+OuVF/xezeT3EO" +
    "QK6rKmVmUmZQEzufR6ACCX50BEcFb3KoSgtjZTkzMazo4x6epy4Bt7wLCUVNYt+MToPJLLxJ" +
    "CWTAL6ODT20VpcPvDEZXMfj0+irLSsVN75LpJtOAQM7bI8zijH24x5GTWKt5uVUOc9bw/ENj" +
    "P24rY0H9UAJ7rbhU/jdSSwEjTfw6GYjDPpBji4toU0BoF21SFE0H1vLhqXbs15t5v6aN/Tvv" +
    "UuOMCoALNUPpXF2xTdBIaXcB6NbYQ9Xr7Ng2VTqCD8SY9ISBjgxEYqF6wlgQzoVI1RpmtPYr" +
    "swAAAA=="
  private val exp3: String =
    "NlNKPlNZSlRkNVZGSUdZRzxFR08+PUtZQFtPTUtQSEhVUlpMOVFWNltXWkBQRUtXYE5URU1E" +
    "RUk9T0NDRVJMYVFhYFQ+RkxFSk1XYkFHOVI8MzYuKzg9Rjg1OjomN083MiQ/MTM/QSotK0M0" +
    "R0A9OkJTSGI3M0JSQ1NtUUgrREREaUBQSkdNT19QTU5WSE1aYF5cRUVdcmJMSE5aX3xRYVEr" +
    "JCUaOC5RKTQiOCkqYEg6O0FBSVNTPkJEZlBqVlBHSz5ScDxMZlZiXG5gTkZmTl6BUG5YZF9y" +
    "em5kVV1lXJiIfGhxfGOWZYSAgYeWlXGXVTVCJCgrOFE0LkNGVkhpREJWSFxFezlUPj9QZW9O" +
    "UFpiYl+LYGCAXoJbgW95f4prg5ZsfGxylYCnbJt/hZiJrqOXm3eOesSskZ2praHJoZ1VMCsg" +
    "LC5GVjsvNUAzP3JTU0RJRlB7VWJDWlZYgGRsdG5+d4KAZ4Z3f4OVeJN3dniEoIh+lpGUpaib" +
    "mbO6rLTQOSw1NilKaE0oPTc/M3tFSENQPEJbYGNsZnFXY3Z0a4Vceop8dY+Wj6GOipSZrbSc" +
    "nKqptcaYsLK3rrWtsMiz2MO9xb1YX1ZfXGBMXXt0bGuAenNvYWt0YnmEgIOclpaSUzE4OChI" +
    "RnRAQEZMU1CLWVRRXXlamntnhGR0epibjoSToJ23rJK4oJiV1y42RT5CLm1MP1dYT0VdVWRp" +
    "UF1viINxenl6a5mIgImYkJ26rphWQjxGMz03YEZaYllSWXhiXFF2bYySendtkZyVqo+BpY+d" +
    "sLKgM0AtSDRcRUlFTmBOgGVVcX5mdo18eI54gp+niICCgZG0yJqnqSY0PE45RVAkPkE0S0pv" +
    "Vk5iV2JOiGRgcG9yaZ92k4OPna3CpaOfOTk6UCw+REFQYWlYUFpifmyDhHx7i4WQn3qikrGr" +
    "p7w6KiswQClTXVtVRFlPemhzRCVJQkJDRmxXXj9RZFSPb4tzeoiDoo2bh5iSqswqQDEoV0Rb" +
    "S19fVltnimB2dJGDfLiIlZ6ilJ7KIC8/Plk2aFk4W0ZYYIFpaoKDi2+OppJGTVpZWGtiZ5Bk" +
    "in6CiJuRnJ+qsa7Fw9mz2FFdZGRnZWmPgYaFjoaQlLGjoqSjrMPOurvTZExXZFJibXuBdpp0" +
    "gKyYpomyore+x7msxU9PXEAoSkc8R0Z1U11OZm9tkoCLmIiYqLqkvkQkLTxoQUxGW1ZXnXFv" +
    "gXCUlLGYobarOS1SSz9WVFFig1pubId1epiMmqKtpb5DPEtIRExJdFZwQSNDNj1hR29QYmt3" +
    "gIuimnygiqyc1TAxQkA6Um5xX2BgdoeOiImHqZqtvD48Pz5GWHNQYYBqg3OifY97gK2bzDIx" +
    "NENKU3pZRl95XIWfg4FRLjFFSEJlc3BbcHWFeriWgJW5ozNENjNQVGVbmHRabZFtjb2amJ+z" +
    "Oz1gWUFAZVp5iWpuhIyVo7i8or89Mll0UjdGV3OHnXx1n5CYjrmtP1I/MldROWWCXGlzc3+f" +
    "o5SbpbcVNlw+V1BmcW2GbJd7lp+iv7I1MFRIRmFrWmlyf3OghYOroLcwRkA2MVJhUYZ1cnhy" +
    "iYy6lpSuJDlUbVFaSDxUWVZ/eZh/k5Wjpce+xcPYW1NrUHFrjoGAkbq1w8Gv0tRRZ3BfboB3" +
    "kaWlorqlr8C4zVRpd3p4fYCNkqyZmba/rrXUSXVwcGGNjIqLkaE/KkJROkZjh2V7j32Umaue" +
    "OTVDRkN9VFZqiXGBoI6hqjgsMFNSY0Vrc3SPj4WHn7UvZjsrYFhsXoNjiHCXnavJLytIOz5U" +
    "gWJsgXeWk7WzrDM/M0dRSFuKa4d7mZSbzadCRUlTY5ZriYuNiqKxjbUtLUFfal9pYoGVgaev" +
    "prA1TU9zRExnboeZspCuqKYlPlhcSlZocYGbeYmJl6QcbExoPzVMS05hZYeJg3V5mafQPTg7" +
    "SVJSjICBi3ucpswhNVpQSmN8bnB4foigzCo6UVpWZpJwfoyKoqG7LklFV11DiWWAen5/kd3E" +
    "LzVITW2ZXHpLOz5SSWpimX+Ao4y0r2wrT1VRXVmhgZp8pbEuYD9bRnJlfY+LjYOiuC9RRUtT" +
    "UWx/m4Wfm5QxPV5UZmRpa3KyiZGipiA3X1FOXH1zirGKtFBPXnCMjZSSqK+wysZFWlpmdYOF" +
    "kLOdubu+YGRsYn92h4WWucyqzFVPZ3Rseaugn7zGwMJTYIF3g5KOpqzKts5MT3NnhYaIk6Wj" +
    "n8bWVV9WTzFIRVVpb6d1hYKZq0RgPUxefm6HqZKopjM0MXhUaX5ymZO6pTdITWBCj4mTh46f" +
    "lF8wOEJWbGuXeImMjTtAcFVRd2ppeZOXkrc9QERgW1c7Oj1QXGVgpIOcjawWT2dcXV1whHCv" +
    "jLE4Q1tJhV+Lc5ORs007P19UX3iagJaMokJJdFRMUXZpiMKXnUM1Rl2IaHZ9lqaVYDRDT1ph" +
    "brOKjlFLRkJkXWaOj3+gpD5Tdld0WYiGj8GmMT49ZU+kgoKjoJEzZE5IanB9h6edtDQ+RUZ9" +
    "Zn+JqbS2PERPXFd+gJGpf5QsM01maVRvjoyHwDpBXi1BW15+fqKKn6k7OTl6YGFzk5CiykMu" +
    "ZExoXKSOhKYyQEFkVG5+i4OVyy8+TFFebKGZkoqtJlZnUmFzeZqYszIzL1xRfZx1fIS4OEpd" +
    "WG1QRWGFgZicqbjC5mZggG6GlJ+izNRIVFGJiZCWvb/QS1Nhe4SWq6a8s2BgbXN/j5y7utW7" +
    "T39eeJuZn7fB3UlicYJ9mZ6iu9hQY1tpjaCmpEc8Pz5fdWWippEjMklZf22FipKSM15Zam5j" +
    "cZXAqkxIVVxXiYR9pp9CL29HcHeTmZ68QUROZGyFs4elvCVfU4JfeXebiyRXQFFgZniMr5k2" +
    "OTtFZ110dqaxoDBMWVyEaYGdri03b1NbdH1/l9QfTmVicoO+hqceMj9ic3OAgKChQWlWbGh3" +
    "e6TFRENQVnh8sYSYnjI2UYd0cXylkTBPUlRYLjZDUGCdvKamNUVkTYCJm6O8NT90a15shJmZ" +
    "VktVVmtrmcuuQE5SZ2Speq6pMDU9h4F8foW1KldUcXCAjKfSKCc/VFZsn5ygrDZLQ29ieD02" +
    "QWRgfZDAqEIoPVZ7nG6dpzJOZIZ0g4ytrkRUVV9tfY2lyjJKWVd6fKSYqkI4Xm6VfKCoISVJ" +
    "fmR4d42vKFk+UmaNno22JS5YUnpypoSTS1F2d3+LjrS6ZnNxdYSmv82+X26LiZGqy8ZHant3" +
    "e4WnsudlboiJiLLHyVJbW4KRm6ezulxshoWZlajMT2F8g6CroLHRWFJ/eaG4xdBEbXtPK1NU" +
    "WXGQyJFBTVBpdaaXmDo9VWSHfZyhLkVKjoCHh5ahMG1bY3SNkaFaYUJgYoCsxDdAZE9mba2j" +
    "KURIUnueg7O1TUlRg5eRpKk7V256aExUTWRme4u9PUBbTGSEpIUrIFJbeJialitKQW6Yk4iJ" +
    "J0FgfnJ+i6AlO2Rch2eNli1NO1Z+Z4+nWkBIWmWDiMcjLmZafn+kjDJCQmR8n4ihT0RGUm+Q" +
    "jsdDMUxvYn6pokVIVleTmK2mS1NVbZB5srU/O12HkJeQLkZijHmGlaArOml6YYWknDp6VnKE" +
    "i461bVp5d5N7qVxbYWV1cZrFRkpNP2hqb4yVxElZUW+Qlb2cRkJbd322sjJAcGRwtp2fL1hd" +
    "gqaZpzY3VmSTgZOxRGRWk4CJlDxFVIKAhpywNz54YIuVnh5GcGB5i56VNmZacVtLhXSSqqrP" +
    "ZHx9iKmtqkNoY5SUmsFLZHKMn57AtVp1c5mxushcXYCGpaDDXF+IfKGOtslkWn6TsbjDUEyP" +
    "ipqywUR2bYSjurbJTGCMgbK/WDw7UHmOl8hCOVVqi4XVS1NjgH+f3S1UU2h5l8JCOl9nm6bD" +
    "P0NeZo121z00cWVwn7AqNj1zdY2xOk48cHyFwj9ITGtrg8e7PUpkdXe7sDNVQk1UeXSTV0Vb" +
    "YWSUp2U5Wnh+n59USFx3do6RWT5iXXqXnEtJWW96rq5AV2h/i6WhUllvanmWq2taalycmpVq" +
    "RGlyh6C3W09jaXycpmFNcUVLWm2EnKBTUE10f4alWFRieHiosFxKfoORoi14W2KBjpo0eltp" +
    "k5CuM1xoZoyamDN/ZoGTmkhKjnNrnKIrPoByi46UKkqPXIqlmTE+b4ODTERRWXmku2JIVXOQ" +
    "gblpT1lzkKM3fV5nlpapUHV7joGSRjl6W3CQnjxJhm6JjEFRQXdylKNAOl6Dj5qlSkxyhI6N" +
    "IjtRaKCBukA+W3G4pzdiaWqPnbvGSGuFiZvMVmd0jru3xFhbdJ2bskx3g4KhsDZncIWFpLxP" +
    "b3+jnbFfV5CBm6zJcXqWoLvNQWh8i5CoWVdpdqa9tlaIdIudvlNMakJBbXmSh6dNa3VzkahF" +
    "Zl19ioguQXxxnLEuO2iUfZ+mO1RklKKaNVxybamjPjhKdHmxJlNPcY2lxytuZIKesltSbn2Y" +
    "qCpoWnOOpTpFdm55QkBXW3KTsk1hVGqHtSlhUJGElk5MfpCMnjtNX5WXmixdeXSnqjE/c22P" +
    "uCpUXmuXkz4/XGOCpStkYF6FjS1GZndzm8NKYnZtnqkwTXedkpBNQXN2gJAgYGRefKJGPYSA" +
    "c5Y3QGOXf6o4OFl/nZMqTV56drQpPWRsgqFRS0hqmJlHbWFriqQ8XYp1j7M3OW+xkY85SGt8" +
    "sp5JU3pqisRHRURKZoCWpzJvTWaIoTQ9hHmcrS1QaZKKuUZRVoa/njpXWHuwaDlfbH2WLGZX" +
    "dYWKK1SGf5SrT2BalI+9ME9ejbo3WE+AjatWR2p4kqUxVlZ2U1lqkI/QTGyFjbrFVH+EqMrQ" +
    "an+Xm8phfpShmbRWfoKkvttie6CizE9oepGvtlFmlpi1uG5rirTASniCn7XNXXCPj6rPWn2S" +
    "nc9BWnyWrr5IQVphkpg9dW19oq5Dap19hChMaXyntFRgdI+NRzdqio6qQIZqhZ9IU2qOj6I3" +
    "P1VysrA6Wl2UnlhPZXKao0h2aXmiM0JcoompMVlueq43QmtOYF2TrzOCYIOaIE9gm4y5MFp0" +
    "ibQ6UWN2jK5rW3Z8nUBPfI+CrDtJY6WUPFFRe6XSPkh0hpZAd2twpio4Xad9qiRbdnjNLlBy" +
    "jpCZU011kp6lnZOmg6KehY+igaCYnZmEjqW8oYGkj6uIooSPlaC1nJS1sL2alaO4rrCphaat" +
    "tayajJCsjIeDl4+eqHGJknuEfoBzco2Io45bh3ZseXaLkKSWn4OHjJaPgZKIcHKPZnN3iXht" +
    "XmBqVJWHc4ePba2wmoKKlIeKo7ycoqO1j5WLgJx4boB1aV9Hf6xupby2gpujmH6CboaGcWxD" +
    "jZVyjJjTtI2UcomRbmVicmBcZ3GvlpybrIt2kFyelYB3lIaLnYp4jIiNWaqvxbWEe3p0Y2Vu" +
    "ZGhymH+Mr413XIthdXlhh5WHgYV2d3JaeWiWZFiuqX6rj4mTiX1Wa3qnjpCSYXlwS2GYhY+t" +
    "ineZbmuJqX6eepxwb4h3n46CiKSGk5ByWYyLkYB6Y3WAaIN5c35rdGZoap19i4diYVVYln2U" +
    "jFd6ln1yfHxcYaS8m3ucd2pcjpG7gF54aZyxdb6Wdn19iamSk4NrgIODqayLZJBrdo2ZnH6J" +
    "W22Cm7ONiE97mYOChHtbg4SnrHh+goOJlneifJaEjoBoaGyQa11sV3SVn4COa3l7fWWYeY+W" +
    "npuKg3Gbn5V0aGxrhHiihpyBbUOagGh1ZF2dnIB6aW+LlXllmJOWg3t5c7SZiYZve6iVlHGZ" +
    "oLeAdl+Jo3RieIGInG1iYqF5kX50mo9wbWyQkYhZYm+wd2xoU42idKmne25njYmAbm+kpJd6" +
    "a6SmgGqFsHt4Z26KfoeGkJ6Ug3d/maCEiZWelX6BcIyRV166tnp8goKSdIm6tYBba6aPkX2T" +
    "m41uh5SafpZ1jm1fkqByVWmQi4ZunY1adJeDZGiEjG9aiHpodnyMaWF4voZ7dH17fZePn56N" +
    "iX+gjHVep4h3ebCRd2OfmZNsxJB6i5STdGqdlHZ2tZJtd6qRZ4igm4RXqml4S4SJUYydjEqH" +
    "mmV6nJlonrNvZHOjdGqJiGGUi3GBdod8qH+Tf5lubY6TgGGve2eGg2p5k3KBnaGKgad2h46c" +
    "dYy3oYNuiYSLhYGSiaaMlWClg5S/iZyVhoeMmHN6rZ1kk4NtbqyFZ6WRcXmSbZ+Bfpq9g2tt" +
    "hWmQmIVmZ5pil3d9n3NNnIJnrpNJeat0dJ6RbJt+jI2bg4SIoZlee4prfoFlo4yLfphfmalN" +
    "rKVvloOEho2MoIWCj5FVjphhlKhweqCHcZGHYIFec6p1ipCAc6Frn4NioohwkIpen5+UknSB" +
    "woGZfJt9f1ewbYCscG+bdX6hbZ2OXaWPipSPkIZlhHZtiHx7d4uqh2uMg4aCf2iBuaqzvrSs" +
    "srmbvqmrrqytprzHqaCmuqmlwJ6tpLump6+wr5injqOtoa+DhJ+Cl4qdfoOXfXKCjXR7iWl3" +
    "ZIxnZ4tqVWx0X1liXUdWalVlak/Il5m6mJaZrYqKlI2CgZOCiIZtamhnaVhTR4SNjHiFjauV" +
    "jKuJf6SNtI2GkXh6eYBZcXNfW1JkTU1qWGFjhYeHoHuDanl2ZH5TTVBzL22UbqSIfp6Ddl16" +
    "aGVkSklNfnGUnnhyaHRlZ3pHQzxfbHxriHt7inNodVWqoYegk4B5iH9fbmKNpLiNe5F+fHd3" +
    "WneadK2hloSKeXp/Y6iNfq6YnpZ2hmJiW3JEPoF6iXuTaGNxW0dqnYNzkGldaW06X4h7goCU" +
    "Y05lV7yji5Z1Z2lrXY6mj458jHdUg6CnlaOKfHBMn5yxfYyKf1x/jGiZopuvim2UYVpaTZt5" +
    "kHFmUEZfkpJoX2tjOmukdWJsY0hQf4B/aXNYPIN6on14j1pBP6CGandfSmiYhGJ3TkpSiY58" +
    "fl9QgJuKZ3VTOF9/c4B+U7WempJuV42lmo+JaGOhlYFgbG6mmKh5cYFmjJOCXYOLlJCAfFuO" +
    "m5WpgmhnUUKTnG9fWViBcYRYO6uAdGdoTnWSb1pKhGV0fUZmbJVeWmNys4eTimiUjph7YXGa" +
    "j3qHcJ6ggHJtl5OKjmR+mJCGc4yViYFyiouYiJpsc19GlIF0VVakeVRGc5tvckVlc3taVoaM" +
    "cVZ7Z319RFRwmE9IfnCgalh6Zn5vclB2impJVKpsVGNqbmlsaXiEYVZ7kmRbi3hmWGhlfHBC" +
    "rIhxdYmXcHpsmo14d6CcZ0+ik3Jup4R/cXmUfXCIgJx0coufc3aejK91WVmPdFZOi3J6SpR0" +
    "c0aAgVlcfYNdR4tdWWClcU50fXFXjYxdeXSyk25qspZxe5V3fZmWaHaPgpV6mIBrd5WJYJqJ" +
    "iX+CiXeEkpZZbpKEpmREbINfS5l/YIR4ZkSQdGduhm9HkXdVaINkQZtoamB+XUaOdlVec7hs" +
    "XIGAWz+gZj+IeFRuqV5XnGdLbX5TbopoZH+ISG5+UV5ucVhbcFurk3CHnWyHl3pup299oItU" +
    "mZFhhYx9hYuAiYuIepNveqB7cot/fZ50pW1KjWJJgYFPb4FLhmptb3FrbGJPiWlLm20/fo9I" +
    "b45bZXtmZmJrXK2LbrVxaaSXYI+DcahrbINxmZN0hJFkfJBkinZ4hIGIlXBqsGyJnnmga0Kc" +
    "aWKDdF12ZYRnU49jU5dUbHVmfltdZlhbpVNUlk52a3t6bmuH"
  private val file4: String =
    "UklGRqgBAABXRUJQVlA4WAoAAAAQAAAADwAADwAAQUxQSMMAAAABJ6KokSTleucYX+ffKpmI" +
    "mP90cY3gJjDi4Yt3MsjBEVyDKzDosHgVjnhRNcEIDAJPkqBqsFUZHNa2bUYvTsZ2PLbtd/uv" +
    "Ka4hov9J0f2PkPe6REkkGzolkTTzFG0Ox9PlFiD0CxS+kOGDtxoynjaCfx0pfk52CPuInrOR" +
    "75lzRugygtv4zEiy90UwfSD9NheMITJWLaXWayO8XeOlWRXVnIGk2W6WdYoYMQ+KqixQNPow" +
    "gt+6a1BSKbUtz+lUFAoBAAAAVlA4IL4AAACQAgCdASoQABAAAwA0JbACdDBPCIUMfAMdCCz9" +
    "6AD+/XSg/QKbH4r3Q3ycN/bSDK/T/zVo4u6nvclvG/SqxWOuup+XhN9BojvaW+Tv+MvxvX/h" +
    "r/o/5Qns9LtmX/+qKdl/yWznhuasl7nkxvSTI4xf3Y85VSB/lU/8Ofj/b9JrA+ifvIOYZm2x" +
    "1RP/dhfmsf5diuSfR7+z+r/+HR3zEo/+XM/B+vkYw73Pzx+ROaAB/ZoBSzEs3rzZe6qsAAAA"
  private val exp4: String =
    "DhgPDXl4eXRpY2APDw8PDxUTFxF33HdwaWNgDw8PDw8RFBAWeXd1Z2ljYA8PDw8QFnt9d3Zv" +
    "ZmZpY2APDw8PEIF+enlzbWpsX11fEsjDvRF+e3dxamZlYGJgZArIw70SendzcGlgZmZfXBO7" +
    "yMO9E3d0cG1kMhUQEBmyvMjDvRN0cXZhHMbUzsvIxMG7urcUcHFnN87S08zLysbDwr6vF25p" +
    "ZQ3c08rLx8K+u8C4lBEPEQ0OzsLGtre1sa6omBoUDxENDsfHx8fBvrIPEhEREQ8RDQ7CwsLC" +
    "v+a3FBEPDg4PEQ0OvLy8vL+4hg0ODg4ODxENDxESEhITEhEODg4ODnaDlKGgi4R3jJOdpJCL" +
    "f3idnZ2dlI1DYqGblI6OUTFZpZhWST0uLVWSg0AxNTU1c4F5QDlHV4h/en9XXFZohoWKfm1g" +
    "Z29+i3VuZF1icH+FZGRkZGd/jopgZm5zc5Khl2Nqi5GcpKCQdHiVmZialY2AgJiYlIuHiH98" +
    "kI6QgXyFAAAAAK/t////95ILAwAAAAAAAAD/////////KAsAAAAAAAAA/////////0EVAAAA" +
    "AH6goaOnqqr///9IGAAAAL3/////////////SP/3ggr/////////////tkP//+0k////////" +
    "///3tk+I////Pf////+2XExIR0Fr9////0b3//+qTqb3//////////dH1///W7P/////////" +
    "///CQW/3/0v/////////////ejQIITw1////qqmpqampeUEgAgkTEv////////9BNSweCwAA" +
    "AAD3///////3QBwJBQEAAAAATMz3///YezsSAAAAAAAAAAgdNUJHRTgfCAAAAA=="

  val byId: Map[Int, Fixture] = Map(
    0 -> Fixture(16, 16, file0, exp0),
    1 -> Fixture(48, 32, file1, exp1),
    2 -> Fixture(37, 21, file2, exp2),
    3 -> Fixture(80, 48, file3, exp3),
    4 -> Fixture(16, 16, file4, exp4))

  def fileFor(id: Long): Array[Byte] =
    byId((id % byId.size).toInt).file

  /** IVF inter-frame fixture (r12): fixture 1's REAL libwebp keyframe
    * (48x32 — a multiple of 16, so the cropped planes ARE the
    * reference buffers) followed by two writer-assembled pure-MC
    * interframes with every MB NEW and skipped:
    *
    *   frame 1: mv (16, 32) eighth-pel = 2 px down, 4 px right —
    *            integer everywhere (chroma mv (8, 16) = 1 px, 2 px);
    *   frame 2: mv (4, 6) — luma fractions (yf 4, xf 6), chroma mv
    *            (2, 3) (yf 2, xf 3): the full two-pass 6-tap on both
    *            plane resolutions, chained off frame 1.
    *
    * These constants are what the vp8_inter_frames oracle re-derives
    * in SQL from the externally-pinned frame-0 planes. */
  /** The shared 3-frame VP8 sequence (keyframe + the two MC
    * interframes the oracle re-derives) behind BOTH container
    * fixtures: (width, height, frame payloads). */
  private[operators] lazy val interSeq: (Int, Int, Seq[Array[Byte]]) = {
    val f = byId(1)
    val key = {
      val b = f.file
      def le32(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
      var off = 12
      var found: Array[Byte] = null
      while (found == null && off + 8 <= b.length) {
        val tag = new String(b.slice(off, off + 4), "US-ASCII")
        val size = le32(off + 4)
        if (tag == "VP8 ") found = b.slice(off + 8, off + 8 + size)
        else off += 8 + size + (size & 1)
      }
      require(found != null, "fixture 1 has no VP8 chunk")
      found
    }
    val mbW = f.w / 16; val mbH = f.h / 16
    def allNew(mv: Int) = Array.fill(mbW * mbH)(
      Vp8Inter.WMb(Vp8Inter.ModeNew, mv = mv))
    val f1 = Vp8Inter.buildInterFrame(mbW, mbH,
      allNew(Vp8Inter.packMv(16, 32)))
    val f2 = Vp8Inter.buildInterFrame(mbW, mbH,
      allNew(Vp8Inter.packMv(4, 6)))
    (f.w, f.h, Seq(key, f1, f2))
  }

  def ivfFor(id: Long): Array[Byte] = {
    val (w, h, frames) = interSeq
    Vp8Inter.buildIvf(w, h, frames)
  }

  /** The SAME 3-frame sequence muxed as WebM (r13) — container-shape
    * variants cycle by id so the triage and the skip paths are
    * load-bearing: id%4 = 0 two-block clusters; 1 one cluster per
    * frame + a Void element between top-level children; 2 an
    * OPEN-size Segment (live-mux form); 3 one cluster for all. */
  /** WebM with a SUBTITLE track (r13): the same video sequence plus
    * 2-4 S_TEXT/UTF8 cues with id-derived timings and UTF-8 text —
    * the video+transcript shape a multimodal curator extracts. */
  def webmSubsFor(id: Long): Array[Byte] = {
    val (w, h, frames) = interSeq
    val n = 2 + (id % 3).toInt
    val subs = (0 until n).map { k =>
      val start = 900L * k + (id % 7) * 40L
      val end = start + 500L + (id % 5) * 20L
      (start, end, s"cue ${id % 9} $k \u00fc")
    }
    Webm.build(w, h, frames, clusterEvery = 2, subs = subs)
  }

  def webmFor(id: Long): Array[Byte] = {
    val (w, h, frames) = interSeq
    // r14: ids with id%8 >= 4 are A/V — the same four container
    // shapes plus an audio track whose triage fields are id-derived
    // closed forms (codec/channels/rate by id%2, 2+id%3 packets of
    // opaque bytes the demuxer must count but never decode)
    val audio =
      if (id % 8 < 4) None
      else Some(Webm.AudioMux(
        codec = if (id % 2 == 0) "A_VORBIS" else "A_OPUS",
        channels = 1 + (id % 2).toInt,
        rate = if (id % 2 == 0) 44100 else 48000,
        packets = (0 until (2 + (id % 3)).toInt).map(k =>
          Array.tabulate(16)(j => ((id + 31L * k + j) % 251).toByte))))
    ((id % 4).toInt: @unchecked) match {
      case 0 => Webm.build(w, h, frames, clusterEvery = 2,
        audio = audio)
      case 1 => Webm.build(w, h, frames, clusterEvery = 1,
        padVoid = true, audio = audio)
      case 2 => Webm.build(w, h, frames, clusterEvery = 2,
        openSegment = true, audio = audio)
      case 3 => Webm.build(w, h, frames, clusterEvery = 3,
        audio = audio)
    }
  }

  /** Expected rows (plane, pos, v) for one fixture id — the oracle's
    * source of truth (pinned external bytes, not engine output). */
  def expectedRows(id: Long): Seq[(Int, Int, Int)] = {
    val f = byId((id % byId.size).toInt)
    val cw = (f.w + 1) / 2; val ch = (f.h + 1) / 2
    val sizes = Seq(0 -> f.w * f.h, 1 -> cw * ch, 2 -> cw * ch) ++
      (if (f.expected.length > f.w * f.h + 2 * cw * ch)
        Seq(3 -> f.w * f.h) else Seq.empty)
    var off = 0
    sizes.flatMap { case (plane, n) =>
      val rows = (0 until n).map(i =>
        (plane, i, f.expected(off + i) & 0xff))
      off += n
      rows
    }
  }
}
