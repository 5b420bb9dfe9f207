from tinygpt_tpu.server.http import main

main()
